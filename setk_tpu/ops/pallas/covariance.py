"""Pallas TPU kernel: mask-weighted spatial covariance accumulation.

The hottest memory-bound op of the enhancement pipelines (SURVEY.md §3.1):
R[b, f] = sum_t m[b, f, t] y[b, f, :, t] y[b, f, :, t]^H.  The XLA
pair-loop formulation (enhance/beamformer.covar_stats) re-reads the
observation tile from HBM once per (n, m) pair; this kernel keeps the
(F_tile, N, T) observation block in VMEM and performs all N^2 masked
reductions on the VPU in one pass — one HBM read of the observations
total.

Complex data is passed planar (re, im) — Pallas TPU kernels do not take
complex operands (mirroring the reference's own interleaved-complex
design, /root/reference/include/complex-base.h).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["masked_covar_pallas", "compute_covar_pallas"]


def _covar_kernel(n_mics, obs_re_ref, obs_im_ref, mask_ref, num_re_ref,
                  num_im_ref):
    mask = mask_ref[0]  # (F_tile, T)
    # cache masked channel rows once
    for a in range(n_mics):
        xa_re = obs_re_ref[0, :, a, :] * mask
        xa_im = obs_im_ref[0, :, a, :] * mask
        for b in range(a, n_mics):
            yb_re = obs_re_ref[0, :, b, :]
            yb_im = obs_im_ref[0, :, b, :]
            # x_a * conj(y_b) summed over T
            re = jnp.sum(xa_re * yb_re + xa_im * yb_im, axis=-1)
            im = jnp.sum(xa_im * yb_re - xa_re * yb_im, axis=-1)
            num_re_ref[0, :, a, b] = re
            num_im_ref[0, :, a, b] = im
            if b != a:
                num_re_ref[0, :, b, a] = re
                num_im_ref[0, :, b, a] = -im


@partial(jax.jit, static_argnames=("f_tile", "interpret"))
def masked_covar_pallas(obs_re: jax.Array,
                        obs_im: jax.Array,
                        mask: jax.Array,
                        f_tile: int = 16,
                        interpret: bool = False):
    """(num_re, num_im, den) from planar obs (B, F, N, T) + mask (B, F, T).

    F must be a multiple of ``f_tile`` (pad upstream; padded bins produce
    zero statistics when their mask is zero).  The kernel emits the
    numerator planes; the scalar denominator row is left to XLA.
    """
    from jax.experimental import pallas as pl
    b, f, n, t = obs_re.shape
    if f % f_tile:
        raise ValueError(f"F={f} not a multiple of f_tile={f_tile}")
    grid = (b, f // f_tile)
    kernel = partial(_covar_kernel, n)
    num_re, num_im = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, f_tile, n, t), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, f_tile, n, t), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, f_tile, t), lambda i, j: (i, j, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, f_tile, n, n), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, f_tile, n, n), lambda i, j: (i, j, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, f, n, n), jnp.float32),
            jax.ShapeDtypeStruct((b, f, n, n), jnp.float32),
        ],
        interpret=interpret,
    )(obs_re, obs_im, mask)
    # the mask-sum denominator is cheap in XLA (and fuses with callers)
    den = jnp.sum(mask, axis=-1)
    return num_re, num_im, den


def compute_covar_pallas(obs: jax.Array,
                         mask: jax.Array,
                         denom_floor: float = 1e-6,
                         f_tile: int = 16,
                         interpret: bool = False) -> jax.Array:
    """Drop-in complex wrapper: (B, F, N, T) complex + (B, F, T) mask ->
    (B, F, N, N) complex covariance (pads F to the tile internally)."""
    b, f, n, t = obs.shape
    pad = (-f) % f_tile
    if pad:
        obs = jnp.pad(obs, ((0, 0), (0, pad), (0, 0), (0, 0)))
        mask = jnp.pad(mask, ((0, 0), (0, pad), (0, 0)))
    num_re, num_im, den = masked_covar_pallas(
        jnp.real(obs), jnp.imag(obs), mask, f_tile=f_tile,
        interpret=interpret)
    covar = (num_re + 1j * num_im) / jnp.maximum(
        den, denom_floor)[..., None, None]
    return covar[:, :f]
