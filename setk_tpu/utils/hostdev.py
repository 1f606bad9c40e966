"""Host-device placement helper.

On a TPU-default environment, *eager* jnp ops dispatch (and remote-compile)
on the accelerator one primitive at a time — pathological for the host-side
utterance loops in readers and light CLIs.  ``on_host()`` pins eager
computation to the always-present CPU backend; jitted pipelines stay on
the accelerator by running outside this context.
"""

import contextlib
import functools

import numpy as np

__all__ = [
    "cpu_device", "on_host", "host_hint", "put_complex", "get_complex",
    "tpu_target"
]

_HOST_HINT = 0


@contextlib.contextmanager
def host_hint():
    """Declare host-only intent WITHOUT touching jax.

    ``on_host()`` pins jax's default device, but obtaining the CPU
    device initializes every backend — ~75 ms of the axon registration
    inside a fresh process (measured r05, benchmarks/bench_sim.py).
    Pure-numpy paths (single-utterance simulation) only need
    ``tpu_target()`` to answer False; this flag does that with zero
    jax involvement.  Any jnp op issued under ONLY this hint still
    dispatches on the process default device — use ``on_host()`` when
    actual jax work must run on the CPU.
    """
    global _HOST_HINT
    _HOST_HINT += 1
    try:
        yield
    finally:
        _HOST_HINT -= 1


def tpu_target() -> bool:
    """True when the *active* default device targets a TPU.

    Under on_host() the default device is the CPU even when the process
    backend is a TPU; Pallas kernels only lower for TPU, so auto
    dispatchers key off this.
    """
    if _HOST_HINT:
        return False
    import jax
    default_dev = jax.config.jax_default_device
    if default_dev is not None:
        return default_dev.platform == "tpu"
    return jax.default_backend() == "tpu"


@functools.lru_cache(maxsize=1)
def cpu_device():
    import jax
    return jax.devices("cpu")[0]


@contextlib.contextmanager
def on_host():
    import jax
    with jax.default_device(cpu_device()):
        yield


@functools.lru_cache(maxsize=1)
def _planar_fns():
    import jax

    @jax.jit
    def combine(re, im):
        return jax.lax.complex(re, im)

    @jax.jit
    def split(x):
        return x.real, x.imag

    return combine, split


def put_complex(x: np.ndarray):
    """Host complex array -> device complex array via planar transfer.

    Some device runtimes (the axon TPU tunnel here) cannot move complex
    buffers across the host<->device boundary; real and imaginary parts
    ship as float planes and a jitted ``lax.complex`` rebuilds the
    complex array on device.  Real input is passed through as-is.
    """
    import jax.numpy as jnp
    x = np.asarray(x)
    if not np.iscomplexobj(x):
        return jnp.asarray(x)
    combine, _ = _planar_fns()
    wide = x.dtype == np.complex128
    f_dtype = np.float64 if wide else np.float32
    return combine(jnp.asarray(np.ascontiguousarray(x.real, dtype=f_dtype)),
                   jnp.asarray(np.ascontiguousarray(x.imag, dtype=f_dtype)))


def get_complex(x) -> np.ndarray:
    """Device array -> host numpy, splitting complex into planes first."""
    import jax.numpy as jnp
    if not jnp.iscomplexobj(x):
        return np.asarray(x)
    _, split = _planar_fns()
    re, im = split(x)
    return np.asarray(re) + 1j * np.asarray(im)
