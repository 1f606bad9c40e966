"""Host-device placement helper.

On a TPU-default environment, *eager* jnp ops dispatch (and remote-compile)
on the accelerator one primitive at a time — pathological for the host-side
utterance loops in readers and light CLIs.  ``on_host()`` pins eager
computation to the always-present CPU backend; jitted pipelines stay on
the accelerator by running outside this context.
"""

import contextlib
import functools

__all__ = ["cpu_device", "on_host"]


@functools.lru_cache(maxsize=1)
def cpu_device():
    import jax
    return jax.devices("cpu")[0]


@contextlib.contextmanager
def on_host():
    import jax
    with jax.default_device(cpu_device()):
        yield
