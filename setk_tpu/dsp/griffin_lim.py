"""Griffin-Lim phase reconstruction as a jitted fixed-iteration loop.

Parity: /root/reference/scripts/sptk/libs/utils.py:176-207 (random phase
init, then ``epoches`` rounds of iSTFT -> STFT -> phase projection).  The
iteration runs as ``lax.fori_loop`` on device; magnitudes are batched over
leading axes.
"""

import jax
import jax.numpy as jnp

from setk_tpu.utils.common import EPSILON
from setk_tpu.dsp.stft import StftConfig, forward_stft, inverse_stft

__all__ = ["griffin_lim"]


def griffin_lim(mag: jax.Array,
                cfg: StftConfig,
                key: jax.Array | None = None,
                epochs: int = 30,
                norm: float | None = None) -> jax.Array:
    """Reconstruct ``(..., S)`` samples from magnitudes ``(..., T, F)``."""
    if key is None:
        key = jax.random.PRNGKey(0)
    phase = jnp.exp(
        2j * jnp.pi *
        jax.random.uniform(key, mag.shape, dtype=jnp.float32))
    samps = inverse_stft(mag * phase, cfg)

    def body(_, samps):
        spec = forward_stft(samps, cfg)
        phase = spec / jnp.maximum(jnp.abs(spec), EPSILON)
        return inverse_stft(mag * phase, cfg)

    samps = jax.lax.fori_loop(0, epochs, body, samps)
    if norm is not None:
        peak = jnp.max(jnp.abs(samps), axis=-1, keepdims=True)
        samps = samps * norm / (peak + EPSILON)
    return samps
