"""Fully-fused single-chip MVDR enhancement pipeline (the TPU fast path).

Chains the three Pallas kernels with a layout contract that keeps every
large intermediate in its producer's native padded planar form:

    wav (B, N, S)
      -> forward_stft_pallas_planar      re/im (B, N, T_pad, F_pad)
      -> pair_covar_complement_pallas    Rs/Rn numerators (B, N, N, F_pad)
      -> mvdr_power_pallas               weights (B, F, N)
      -> planar beamform (XLA VPU)       enh (B, T, F) complex (small)
      -> inverse_stft                    (B, S)

Between STFT and covariance nothing repacks, interleaves, pads or
transposes — the covariance kernel's block layout IS the STFT kernel's
output layout; valid-region slices fuse into the elementwise consumers.
On the ~200 GB/s practical HBM bandwidth of the attached chip this is
what the stage budget is made of.

Semantics match enhance_batch(beamformer="mvdr",
steer="power") == supervised_run + mvdr_weights(steer="power"):
reference call stack apply_adaptive_beamformer.py:74-180 ->
libs/beamformer.py:270-283,515-539 (mask_n = 1 - mask_s, no BAN).
"""

import jax
import jax.numpy as jnp

from setk_tpu.dsp.stft import StftConfig, inverse_stft

__all__ = ["mvdr_enhance_planar", "planar_supported"]

_LANES = 128


def planar_supported(cfg: StftConfig, num_mics: int) -> bool:
    from setk_tpu.ops.pallas.stft import stft_pallas_supported
    return stft_pallas_supported(cfg) and num_mics <= 8


def mvdr_enhance_planar(wav: jax.Array,
                        mask_s: jax.Array,
                        cfg: StftConfig,
                        power_iters: int = 15,
                        nsamps: int | None = None,
                        interpret: bool = False) -> jax.Array:
    """(B, N, S) wav + (B, T, F) speech mask -> (B, S) enhanced wav."""
    from setk_tpu.ops.pallas.stft import forward_stft_pallas_planar
    from setk_tpu.ops.pallas.covariance_pair import \
        pair_covar_complement_pallas
    from setk_tpu.ops.pallas.mvdr import mvdr_power_pallas

    b, n, s = wav.shape
    t = cfg.num_frames(s)
    f = cfg.num_bins
    re, im = forward_stft_pallas_planar(wav, cfg, interpret=interpret)
    t_pad, f_pad = re.shape[-2:]
    ms = jnp.pad(mask_s.astype(jnp.float32),
                 ((0, 0), (0, t_pad - t), (0, f_pad - f)))
    rs_re, rs_im, rn_re, rn_im = pair_covar_complement_pallas(
        re, im, ms, n_valid_t=t, interpret=interpret)

    den_s = jnp.sum(mask_s, axis=-2)            # (B, F): sum over valid T
    den_n = t - den_s                           # sum of (1 - m) over valid T

    def covar(num_re, num_im, den):
        num = (num_re + 1j * num_im)[..., :f]   # (B, N, N, F)
        num = jnp.moveaxis(num, -1, 1)          # (B, F, N, N)
        return num / jnp.maximum(den, 1e-6)[..., None, None]

    rs = covar(rs_re, rs_im, den_s)
    rn = covar(rn_re, rn_im, den_n)
    wt = mvdr_power_pallas(rs, rn, power_iters=power_iters,
                           interpret=interpret)  # (B, F, N) complex

    # planar beamform: enh[b,t,f] = sum_n conj(w)[b,f,n] obs[b,n,t,f];
    # valid-region slices fuse into this elementwise+reduce consumer
    re_v = re[..., :t, :f]
    im_v = im[..., :t, :f]
    wr = jnp.transpose(jnp.real(wt), (0, 2, 1))[:, :, None, :]  # (B,N,1,F)
    wi = jnp.transpose(jnp.imag(wt), (0, 2, 1))[:, :, None, :]
    enh_re = jnp.sum(wr * re_v + wi * im_v, axis=1)             # (B, T, F)
    enh_im = jnp.sum(wr * im_v - wi * re_v, axis=1)
    enh = jax.lax.complex(enh_re, enh_im)
    return inverse_stft(enh, cfg, nsamps=nsamps if nsamps is not None else s)
