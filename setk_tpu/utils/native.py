"""Loader for the native host library (libsetk_tpu_native.so).

Auto-builds from ``native/`` via cmake+ninja on first use (the .so is
untracked); both the RIR engine (sim/rir.py) and the wav loader
(io/native_wav.py) bind through here.
"""

import ctypes
import subprocess
from pathlib import Path

_LIB = None
_LIB_ERR = None

__all__ = ["load_native", "native_available"]


def load_native():
    """Load (building if needed) the native library; raises on failure."""
    global _LIB, _LIB_ERR
    if _LIB is not None:
        return _LIB
    if _LIB_ERR is not None:
        raise _LIB_ERR
    try:
        here = Path(__file__).parent.parent
        so = here / "sim" / "libsetk_tpu_native.so"
        if not so.exists():
            src = here.parent / "native"
            build = src / "build"
            build.mkdir(exist_ok=True)
            subprocess.run(["cmake", "-S", str(src), "-B", str(build),
                            "-G", "Ninja", "-DCMAKE_BUILD_TYPE=Release"],
                           check=True, capture_output=True)
            subprocess.run(["cmake", "--build", str(build)], check=True,
                           capture_output=True)
        _LIB = ctypes.CDLL(str(so))
        return _LIB
    except Exception as exc:  # keep the failure sticky, do not rebuild-loop
        _LIB_ERR = exc
        raise


def native_available():
    try:
        load_native()
        return True
    except Exception:
        return False
