"""Oracle T-F mask computation (training targets) — batched JAX.

Mask definitions mirror /root/reference/scripts/sptk/compute_mask.py:59-107
(irm/ibm/iam/psm/psa/crm with sigmoid/tangent compression); inputs are
complex STFTs of the target and the mixture with any leading batch axes.
"""

import jax.numpy as jnp

from setk_tpu.utils.common import EPSILON

__all__ = [
    "sigmoid_compress", "sigmoid_uncompress", "tangent_compress",
    "tangent_uncompress", "compute_mask", "MASK_TYPES"
]

MASK_TYPES = ("irm", "ibm", "wiener", "iam", "psm", "psa", "crm")


def sigmoid_compress(x, a: float = 1.0, b: float = 0.0):
    """Numerically-stable sigmoid compression for complex-mask parts."""
    return jnp.where(x >= 0,
                     1.0 / (1.0 + jnp.exp(-jnp.abs(x) * a + b)),
                     jnp.exp(-jnp.abs(x) * a + b) /
                     (1.0 + jnp.exp(-jnp.abs(x) * a + b)))


def sigmoid_uncompress(m, a: float = 1.0, b: float = 0.0):
    m = jnp.maximum(m, EPSILON)
    x = jnp.maximum(1.0 / m - 1.0, EPSILON)
    return (b - jnp.log(x)) / a


def tangent_compress(x, k: float = 10.0, c: float = 0.1):
    """Scaled-tanh compression: K * tanh(C x / 2), stable for both signs."""
    e = jnp.exp(-jnp.abs(x) * c)
    mag = k * (1.0 - e) / (1.0 + e)
    return jnp.sign(x) * mag


def tangent_uncompress(m, k: float = 10.0, c: float = 0.1):
    x = (k - m) / jnp.maximum(EPSILON, k + m)
    return -jnp.log(jnp.maximum(x, EPSILON)) / c


def compute_mask(tgt, mix, mask: str = "irm"):
    """Oracle mask from target & mixture STFTs (same shapes, complex).

    irm uses sqrt(|s|^2 + |n|^2) normalization (the reference's choice);
    crm returns compressed real/imag parts stacked on the last axis.
    """
    tgt_abs = jnp.abs(tgt)
    mix_abs = jnp.abs(mix)
    inf_abs = jnp.abs(mix - tgt)
    if mask == "ibm":
        return (tgt_abs > inf_abs).astype(jnp.float32)
    if mask == "irm":
        return tgt_abs / jnp.sqrt(tgt_abs**2 + inf_abs**2 + EPSILON)
    if mask == "wiener":
        # the C++ layer's power-spectrum IRM
        # (/root/reference/src/compute-masks.cc:38,110)
        return tgt_abs**2 / (tgt_abs**2 + inf_abs**2 + EPSILON)
    if mask == "iam":
        return tgt_abs / jnp.maximum(mix_abs, EPSILON)
    if mask == "psm":
        cos = jnp.cos(jnp.angle(mix) - jnp.angle(tgt))
        return tgt_abs * cos / jnp.maximum(mix_abs, EPSILON)
    if mask == "psa":
        cos = jnp.maximum(0.0, jnp.cos(jnp.angle(mix) - jnp.angle(tgt)))
        return tgt_abs * cos
    if mask == "crm":
        cpx = tgt / (mix + EPSILON)
        return jnp.concatenate(
            [tangent_compress(jnp.real(cpx)),
             tangent_compress(jnp.imag(cpx))], axis=-1)
    raise ValueError(f"Unknown mask type: {mask}")
