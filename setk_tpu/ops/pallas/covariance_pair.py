"""Pallas TPU kernel v2: fused Rs/Rn mask-weighted covariance pair.

Supersedes ops/pallas/covariance.py for the supervised beamforming path
(that kernel remains for single-covariance callers, e.g. cluster EM).
Three layout lessons folded in, measured on the v5e:

  * **F in lanes, T in sublanes.**  The v1 kernel kept T in the lane
    axis, so every pair reduction was a cross-LANE sum (log2(128)
    shuffle steps); here ``sum over T`` is a sublane-direction add chain
    the VPU does at full rate, and the (B, N, T, F) input layout is the
    *native* STFT output — the (0, 3, 1, 2) transpose the old layout
    forced on callers cancels against this wrapper's internal transpose.
  * **Contiguous output writes.**  Results land in (B, N, N, F) planes,
    so each pair (a, b) writes one contiguous lane vector instead of the
    v1 kernel's stride-N^2 scatter.
  * **One observation read for both covariances.**  The pair products
    x_a conj(y_b) are shared between Rs and Rn; each is multiplied by
    its own mask *elementwise before reduction* (the literal
    sum_t (1-m) y y^H — NOT the accumulator-level subtraction
    total - masked, which goes indefinite for oracle masks ~1 and broke
    an earlier fusion attempt).

Reference math: /root/reference/scripts/sptk/libs/beamformer.py:87-103
(compute_covar) as used by SupervisedBeamformer.run (:270-283) with
mask_n defaulting to 1 - mask_s.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "pair_covar_pallas", "pair_covar_complement_pallas",
    "compute_covar_pair_pallas"
]

_LANES = 128


def _pair_kernel(n_mics, obs_re_ref, obs_im_ref, ms_ref, mn_ref, rs_re_ref,
                 rs_im_ref, rn_re_ref, rn_im_ref):
    ms = ms_ref[0]  # (T, 128)
    mn = mn_ref[0]
    for a in range(n_mics):
        xa_re = obs_re_ref[0, a]  # (T, 128)
        xa_im = obs_im_ref[0, a]
        for b in range(a, n_mics):
            yb_re = obs_re_ref[0, b]
            yb_im = obs_im_ref[0, b]
            # p = x_a * conj(y_b)
            p_re = xa_re * yb_re + xa_im * yb_im
            p_im = xa_im * yb_re - xa_re * yb_im
            s_re = jnp.sum(ms * p_re, axis=0)
            s_im = jnp.sum(ms * p_im, axis=0)
            n_re = jnp.sum(mn * p_re, axis=0)
            n_im = jnp.sum(mn * p_im, axis=0)
            rs_re_ref[0, a, b] = s_re
            rs_im_ref[0, a, b] = s_im
            rn_re_ref[0, a, b] = n_re
            rn_im_ref[0, a, b] = n_im
            if b != a:
                rs_re_ref[0, b, a] = s_re
                rs_im_ref[0, b, a] = -s_im
                rn_re_ref[0, b, a] = n_re
                rn_im_ref[0, b, a] = -n_im


def _pair_kernel_complement(n_mics, n_valid_t, obs_re_ref, obs_im_ref,
                            ms_ref, rs_re_ref, rs_im_ref, rn_re_ref,
                            rn_im_ref):
    """Variant computing mask_n = (1 - mask_s) in VMEM, restricted to the
    first ``n_valid_t`` (unpadded) frames — saves the second mask read
    for the default-complement case of the planar fast path."""
    ms = ms_ref[0]  # (T, 128)
    t = ms.shape[0]
    valid = (jax.lax.broadcasted_iota(jnp.int32, (t, ms.shape[1]), 0)
             < n_valid_t).astype(jnp.float32)
    mn = jnp.maximum(1.0 - ms, 0.0) * valid
    for a in range(n_mics):
        xa_re = obs_re_ref[0, a]
        xa_im = obs_im_ref[0, a]
        for b in range(a, n_mics):
            yb_re = obs_re_ref[0, b]
            yb_im = obs_im_ref[0, b]
            p_re = xa_re * yb_re + xa_im * yb_im
            p_im = xa_im * yb_re - xa_re * yb_im
            s_re = jnp.sum(ms * p_re, axis=0)
            s_im = jnp.sum(ms * p_im, axis=0)
            n_re = jnp.sum(mn * p_re, axis=0)
            n_im = jnp.sum(mn * p_im, axis=0)
            rs_re_ref[0, a, b] = s_re
            rs_im_ref[0, a, b] = s_im
            rn_re_ref[0, a, b] = n_re
            rn_im_ref[0, a, b] = n_im
            if b != a:
                rs_re_ref[0, b, a] = s_re
                rs_im_ref[0, b, a] = -s_im
                rn_re_ref[0, b, a] = n_re
                rn_im_ref[0, b, a] = -n_im


@partial(jax.jit, static_argnames=("n_valid_t", "interpret"))
def pair_covar_complement_pallas(obs_re: jax.Array, obs_im: jax.Array,
                                 mask_s: jax.Array, n_valid_t: int,
                                 interpret: bool = False):
    """Fused (Rs, Rn) numerators with mask_n = 1 - mask_s computed
    in-kernel over the first ``n_valid_t`` frames.

    obs (B, N, T_pad, F_pad) planar f32 (exact-zero F padding, e.g. from
    ops/pallas/stft.forward_stft_pallas_planar), mask (B, T_pad, F_pad)
    zero-padded.  Returns four (B, N, N, F_pad) planes.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    b, n, t, f = obs_re.shape
    if f % _LANES:
        raise ValueError(f"F={f} not a multiple of {_LANES}")
    grid = (b, f // _LANES)
    obs_spec = pl.BlockSpec((1, n, t, _LANES), lambda i, j: (i, 0, 0, j),
                            memory_space=pltpu.VMEM)
    mask_spec = pl.BlockSpec((1, t, _LANES), lambda i, j: (i, 0, j),
                             memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, n, n, _LANES), lambda i, j: (i, 0, 0, j),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((b, n, n, f), jnp.float32)
    return pl.pallas_call(
        partial(_pair_kernel_complement, n, n_valid_t),
        grid=grid,
        in_specs=[obs_spec, obs_spec, mask_spec],
        out_specs=[out_spec] * 4,
        out_shape=[out_shape] * 4,
        interpret=interpret,
    )(obs_re, obs_im, mask_s)


@partial(jax.jit, static_argnames=("interpret",))
def pair_covar_pallas(obs_re: jax.Array, obs_im: jax.Array, mask_s: jax.Array,
                      mask_n: jax.Array, interpret: bool = False):
    """Planar fused covariance numerators.

    obs (B, N, T, F) planar f32, masks (B, T, F); F must be a multiple
    of 128 (pad upstream).  Returns four (B, N, N, F) planes
    (rs_re, rs_im, rn_re, rn_im) — unnormalized numerators.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    b, n, t, f = obs_re.shape
    if f % _LANES:
        raise ValueError(f"F={f} not a multiple of {_LANES}")
    grid = (b, f // _LANES)
    obs_spec = pl.BlockSpec((1, n, t, _LANES), lambda i, j: (i, 0, 0, j),
                            memory_space=pltpu.VMEM)
    mask_spec = pl.BlockSpec((1, t, _LANES), lambda i, j: (i, 0, j),
                             memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, n, n, _LANES), lambda i, j: (i, 0, 0, j),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((b, n, n, f), jnp.float32)
    return pl.pallas_call(
        partial(_pair_kernel, n),
        grid=grid,
        in_specs=[obs_spec, obs_spec, mask_spec, mask_spec],
        out_specs=[out_spec] * 4,
        out_shape=[out_shape] * 4,
        interpret=interpret,
    )(obs_re, obs_im, mask_s, mask_n)


def compute_covar_pair_pallas(obs: jax.Array,
                              mask_s: jax.Array,
                              mask_n: jax.Array | None = None,
                              denom_floor: float = 1e-6,
                              interpret: bool = False):
    """(Rs, Rn) normalized covariances from canonical-layout inputs.

    obs (..., F, N, T) complex, masks (..., F, T); mask_n defaults to
    1 - mask_s.  Internally works in the STFT-native (B, N, T, F)
    layout — when the caller's obs is itself a transpose of a
    (B, N, T, F) spectrogram, XLA cancels the round trip.
    """
    *lead, f, n, t = obs.shape
    bsz = int(np.prod(lead)) if lead else 1
    if mask_n is None:
        mask_n = jnp.maximum(1.0 - mask_s, 0.0)
    ntf = jnp.moveaxis(obs.reshape(bsz, f, n, t), 1, -1)  # (B, N, T, F)
    ms = jnp.moveaxis(mask_s.reshape(bsz, f, t), 1, -1)   # (B, T, F)
    mn = jnp.moveaxis(mask_n.reshape(bsz, f, t), 1, -1)
    pad = (-f) % _LANES
    if pad:
        ntf = jnp.pad(ntf, ((0, 0), (0, 0), (0, 0), (0, pad)))
        ms = jnp.pad(ms, ((0, 0), (0, 0), (0, pad)))
        mn = jnp.pad(mn, ((0, 0), (0, 0), (0, pad)))
    rs_re, rs_im, rn_re, rn_im = pair_covar_pallas(
        jnp.real(ntf).astype(jnp.float32), jnp.imag(ntf).astype(jnp.float32),
        ms.astype(jnp.float32), mn.astype(jnp.float32), interpret=interpret)

    def finish(num_re, num_im, mask):
        num = (num_re + 1j * num_im)[..., :f]          # (B, N, N, F)
        num = jnp.moveaxis(num, -1, 1)                 # (B, F, N, N)
        den = jnp.sum(mask, axis=-1)                   # (..., F)
        covar = num.reshape(*lead, f, n, n) / jnp.maximum(
            den, denom_floor)[..., None, None]
        return covar.astype(obs.dtype)

    return finish(rs_re, rs_im, mask_s), finish(rn_re, rn_im, mask_n)
