"""Import the reference toolkit's pure-NumPy algorithm modules as test
oracles.

The reference at /root/reference is read-only and its utils module imports
librosa/soundfile (absent in this image), so we stub those before import;
the algorithm modules themselves (beamformer/cluster/wpe/ssl/spatial/
metric/ns) are pure numpy/scipy and run as-is.  Deprecated numpy aliases
(np.complex/np.int used by the 2018-era code) are restored for the import.
"""

import sys
import types

import numpy as np

# numpy 2.x removed these aliases the reference code uses
for alias, typ in (("complex", complex), ("int", int), ("float", float)):
    if not hasattr(np, alias):
        setattr(np, alias, typ)

# numpy 2.0 treats solve's b as a matrix unless it is exactly 1-D; the
# reference relies on the numpy 1.x stacked-vector behavior
# (e.g. /root/reference/scripts/sptk/libs/beamformer.py:536).
_orig_solve = np.linalg.solve


def _solve_compat(a, b):
    a, b = np.asarray(a), np.asarray(b)
    if b.ndim == a.ndim - 1 and b.ndim >= 1 and a.shape[-1] == b.shape[-1]:
        return _orig_solve(a, b[..., None])[..., 0]
    return _orig_solve(a, b)


np.linalg.solve = _solve_compat


def _stub(name, **attrs):
    if name not in sys.modules:
        mod = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(mod, k, v)
        sys.modules[name] = mod
    return sys.modules[name]


_stub("librosa", stft=None, istft=None)
_stub("soundfile", read=None, write=None)
_stub("editdistance", eval=lambda a, b: 0)

REF_ROOT = "/root/reference/scripts"
if REF_ROOT not in sys.path:
    sys.path.insert(0, REF_ROOT)

from sptk.libs import beamformer as ref_beamformer  # noqa: E402
from sptk.libs import cluster as ref_cluster  # noqa: E402
from sptk.libs import wpe as ref_wpe  # noqa: E402
from sptk.libs import ssl as ref_ssl  # noqa: E402
from sptk.libs import spatial as ref_spatial  # noqa: E402
from sptk.libs import metric as ref_metric  # noqa: E402
from sptk.libs import ns as ref_ns  # noqa: E402

__all__ = [
    "ref_beamformer", "ref_cluster", "ref_wpe", "ref_ssl", "ref_spatial",
    "ref_metric", "ref_ns"
]
