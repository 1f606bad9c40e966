"""Shared helpers for the Pallas TPU kernels."""

import jax.numpy as jnp
import numpy as np

__all__ = ["split_hi_lo"]


def split_hi_lo(x64):
    """bf16 (hi, lo) error-compensation split of a float64/32 array —
    the operand form of XLA's precision="high" 3-pass product."""
    hi = np.asarray(x64, np.float32).astype(jnp.bfloat16)
    lo = (np.asarray(x64, np.float32) -
          np.asarray(hi, np.float32)).astype(jnp.bfloat16)
    return np.asarray(hi), np.asarray(lo)
