"""Single-chip fused beamforming pipelines (the TPU fast paths).

``enhance_fused`` is the default: the zero-spectrum-materialization
kernel pair (ops/pallas/fused_mvdr.py — stft+covariance in, weights
through a lane-batched per-bin solve, beamform+iSTFT out with the DFT
recomputed in VMEM) serves the whole supervised beamformer family
(mvdr / gevd / pmwf / mpdr variants, with or without BAN), since the
kernels are weight-agnostic.  See doc/KERNELS.md for the design and
the measured evolution.

``mvdr_enhance_planar`` is the fallback for STFT geometries the fused
kernels don't cover (n_fft != 512, non-hop-aligned lengths): it chains
the planar STFT, pair-covariance and MVDR-solve kernels with spectra
materialized in HBM — correct everywhere planar kernels apply, ~2x
slower at the bench shape (DMA-bound on the spectrum round trip).

Semantics: reference call stack apply_adaptive_beamformer.py:74-180 ->
libs/beamformer.py:270-283 + each method's weight function
(mask_n = 1 - mask_s).
"""

import jax
import jax.numpy as jnp

from setk_tpu.dsp.stft import StftConfig, inverse_stft
from setk_tpu.utils.common import GRAM_PRECISION

__all__ = [
    "mvdr_enhance_planar", "planar_supported", "mvdr_enhance_fused",
    "enhance_fused", "fused_supported", "FUSED_BEAMFORMERS"
]

# beamformers the fused kernel pair serves: kernels A/B are
# weight-agnostic (covariances out, packed weights in); only the small
# (B, F, N, N) -> (B, F, N) weight solve differs per method
FUSED_BEAMFORMERS = ("mvdr", "gevd", "pmwf-0", "pmwf-1", "mpdr",
                     "mpdr-whiten")

_LANES = 128


def fused_supported(cfg: StftConfig, num_mics: int, nsamps: int,
                    out_samps: int) -> bool:
    from setk_tpu.ops.pallas.fused_mvdr import fused_mvdr_supported
    return fused_mvdr_supported(cfg, num_mics, nsamps, out_samps)


def mvdr_enhance_fused(wav: jax.Array,
                       mask_s: jax.Array,
                       cfg: StftConfig,
                       power_iters: int = 15,
                       nsamps: int | None = None,
                       interpret: bool = False) -> jax.Array:
    """MVDR fast path — see :func:`enhance_fused`."""
    return enhance_fused(wav, mask_s, cfg, beamformer="mvdr",
                         power_iters=power_iters, nsamps=nsamps,
                         interpret=interpret)


def enhance_fused(wav: jax.Array,
                  mask_s: jax.Array,
                  cfg: StftConfig,
                  beamformer: str = "mvdr",
                  ban: bool = False,
                  steer: str = "power",
                  power_iters: int = 15,
                  nsamps: int | None = None,
                  interpret: bool = False) -> jax.Array:
    """Zero-spectrum-materialization mask-based beamforming:
    (B, N, S) wav + (B, T, F) speech mask -> (B, S') enhanced wav.

    Two Pallas kernels (ops/pallas/fused_mvdr.py) keep the STFT entirely
    in VMEM: kernel A emits only the Rs/Rn covariance numerators, the
    MVDR weights solve in the existing lane-batched kernel, and kernel B
    recomputes the DFT to beamform + inverse-transform.  Frequency bins
    ride in scrambled radix-2 (even|odd) order end to end.

    ``wav`` may be int16 (raw decoder output): the kernels convert in
    VMEM with the 1/32768 scale folded into the analysis window, which
    halves the dominant waveform HBM traffic; the output matches
    running on ``wav.astype(float32) / 32768``.

    Semantics match mvdr_enhance_planar == enhance_batch(
    beamformer="mvdr", steer="power"); reference call stack
    apply_adaptive_beamformer.py:74-180 -> libs/beamformer.py:270-283,
    515-539 (mask_n = 1 - mask_s, no BAN).
    """
    import numpy as np
    from setk_tpu.dsp.window import wss_inverse_blocks
    from setk_tpu.ops.pallas.fused_mvdr import (_T_PAD,
                                                beamform_istft_pallas,
                                                lane_permutation,
                                                stft_covar_pallas)
    from setk_tpu.ops.pallas.mvdr import mvdr_power_pallas

    b, n, s = wav.shape
    t = cfg.num_frames(s)
    f = cfg.num_bins
    fh = cfg.n_fft // 2
    hop = cfg.frame_hop
    out_samps = nsamps if nsamps is not None else s
    window_key = np.asarray(cfg.padded_window, np.float64).tobytes()

    wavb = wav.reshape(b, n, s // hop, hop)           # zero-copy blocks
    edges = jnp.stack([wav[..., fh:0:-1], wav[..., -2:-(fh + 2):-1]],
                      axis=2)                         # (B, N, 2, hop)

    # the kernel permutes the mask to lane order internally (one-hot
    # matmul — an XLA lane gather or any minor-dim pad measured 4-6 ms
    # at the bench shape).  Only cheap major-dim row pads happen here;
    # the tiny Nyquist mask rides a lane-broadcast side plane.
    m32 = mask_s.astype(jnp.float32)
    mask0 = jnp.pad(m32[..., :fh], ((0, 0), (0, _T_PAD - t), (0, 0)))
    mask_ny = jnp.pad(
        jnp.broadcast_to(m32[..., fh:fh + 1], (b, t, 128)),
        ((0, 0), (0, _T_PAD - t), (0, 0)))

    rs_re, rs_im, rn_re, rn_im = stft_covar_pallas(
        wavb, edges, mask0, mask_ny, window_key, n_valid_t=t,
        interpret=interpret)

    perm = lane_permutation()                         # (257,) bins
    den_s = jnp.sum(mask_s, axis=-2)[..., perm]       # (B, 257) lane order
    den_n = t - den_s

    def covar(num_re, num_im, den):
        num = (num_re + 1j * num_im)[..., :f]         # (B, N, N, 257)
        num = jnp.moveaxis(num, -1, 1)                # (B, 257, N, N)
        return num / jnp.maximum(den, 1e-6)[..., None, None]

    rs = covar(rs_re, rs_im, den_s)
    rn = covar(rn_re, rn_im, den_n)
    if beamformer == "mvdr" and steer == "power":
        wt = mvdr_power_pallas(rs, rn, power_iters=power_iters,
                               interpret=interpret)          # (B, 257, N)
    else:
        # the other weight solves run in XLA on the small (B, F, N, N)
        # covariances — bin order is irrelevant to the per-bin math
        from setk_tpu.enhance import beamformer as bf
        if beamformer in ("mpdr", "mpdr-whiten"):
            # Ry = unmasked covariance: the Rs/Rn numerators already sum
            # to sum_t y y^H over the valid frames (m + (1 - m) = 1)
            ry = jnp.moveaxis(
                ((rs_re + rn_re) + 1j * (rs_im + rn_im))[..., :f],
                -1, 1) / t
            if beamformer == "mpdr":
                # steer from Rs + Capon on Ry == the MVDR kernel with
                # Ry in the solve slot (power-iteration steer, the TPU
                # default convention as for mvdr)
                from setk_tpu.ops.pallas.mvdr import mvdr_power_pallas \
                    as _mpk
                wt = _mpk(rs, ry, power_iters=power_iters,
                          interpret=interpret)
            else:
                # whitened steer: Rn x principal GEV vector (small XLA
                # matvec), then a given-steer Capon solve on Ry
                from setk_tpu.ops.pallas.mvdr import (capon_pallas,
                                                      gevd_power_pallas)
                gv = gevd_power_pallas(rs, rn, power_iters=50,
                                       interpret=interpret)
                steer_v = bf.fix_steer_phase(
                    jnp.einsum("...ab,...b->...a", rn, gv))
                wt = capon_pallas(steer_v, ry, interpret=interpret)
        elif beamformer == "mvdr":
            wt = bf.mvdr_weights(rs, rn, steer=steer, use_pallas=False)
        elif beamformer == "gevd":
            # lane-batched power iteration on Rn^{-1} Rs — XLA's
            # whitened eigh measured ~44 ms of a 55 ms step here
            from setk_tpu.ops.pallas.mvdr import gevd_power_pallas
            wt = gevd_power_pallas(rs, rn, power_iters=30,
                                   interpret=interpret)
        elif beamformer in ("pmwf-0", "pmwf-1"):
            from setk_tpu.ops.pallas.mvdr import pmwf_solve_pallas
            wm, ps, pn = pmwf_solve_pallas(
                rs, rn, beta=0.0 if beamformer == "pmwf-0" else 1.0,
                return_powers=True, interpret=interpret)
            wt = bf.pmwf_select_powers(wm, ps, pn)
        else:
            raise ValueError(f"Unsupported fused beamformer: {beamformer}")
    if ban:
        from setk_tpu.enhance.beamformer import do_ban
        wt = do_ban(wt, rn)

    wr = jnp.transpose(jnp.real(wt[:, :fh]), (0, 2, 1))      # (B, N, 256)
    wi = jnp.transpose(jnp.imag(wt[:, :fh]), (0, 2, 1))
    wny = jnp.real(wt[:, fh])[..., None]                     # (B, N, 1)
    wcat = jnp.concatenate(
        [wr, wi, wny, jnp.zeros((b, n, 127), wr.dtype)], axis=-1)

    nblk_out = out_samps // hop
    wss_inv = jnp.asarray(
        wss_inverse_blocks(cfg.padded_window, t, hop, cfg.n_fft,
                           out_samps))
    out = beamform_istft_pallas(wavb, edges, wcat, wss_inv, window_key,
                                nblk_out=nblk_out, interpret=interpret)
    return out.reshape(b, nblk_out * hop)


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
    fh = cfg.n_fft // 2  # bins 0..fh-1 in the planar planes; fh = Nyquist
    re, im, nyq = forward_stft_pallas_planar(wav, cfg, interpret=interpret)
    t_pad = re.shape[-2]
    ms = jnp.pad(mask_s[..., :fh].astype(jnp.float32),
                 ((0, 0), (0, t_pad - t), (0, 0)))
    rs_re, rs_im, rn_re, rn_im = pair_covar_complement_pallas(
        re, im, ms, n_valid_t=t, interpret=interpret)

    den_s = jnp.sum(mask_s, axis=-2)            # (B, F): sum over valid T
    den_n = t - den_s                           # sum of (1 - m) over valid T

    def covar(num_re, num_im, den):
        num = num_re + 1j * num_im              # (B, N, N, FH)
        num = jnp.moveaxis(num, -1, 1)          # (B, FH, N, N)
        return num / jnp.maximum(den[..., :fh], 1e-6)[..., None, None]

    rs = covar(rs_re, rs_im, den_s)
    rn = covar(rn_re, rn_im, den_n)

    # Nyquist sidecar: real-valued bin, XLA covariance pair (1/F of work)
    nv = nyq[..., :t]                           # (B, N, T)
    m_ny = mask_s[..., fh]                      # (B, T)
    rs_ny = (jnp.einsum("bt,bxt,byt->bxy", m_ny, nv, nv,
                        precision=GRAM_PRECISION) /
             jnp.maximum(den_s[..., fh], 1e-6)[..., None, None])
    rn_ny = (jnp.einsum("bt,bxt,byt->bxy", jnp.maximum(1.0 - m_ny, 0.0), nv, nv,
                        precision=GRAM_PRECISION) /
             jnp.maximum(den_n[..., fh], 1e-6)[..., None, None])
    rs_full = jnp.concatenate(
        [rs, rs_ny[:, None].astype(rs.dtype)], axis=1)  # (B, F, N, N)
    rn_full = jnp.concatenate(
        [rn, rn_ny[:, None].astype(rn.dtype)], axis=1)

    wt = mvdr_power_pallas(rs_full, rn_full, power_iters=power_iters,
                           interpret=interpret)  # (B, F, N) complex

    # planar beamform: enh[b,t,f] = sum_n conj(w)[b,f,n] obs[b,n,t,f]
    from setk_tpu.ops.pallas.stft import (inverse_stft_pallas_planar,
                                          istft_pallas_supported)
    out_samps = nsamps if nsamps is not None else s
    wr = jnp.transpose(jnp.real(wt[:, :fh]), (0, 2, 1))[:, :, None, :]
    wi = jnp.transpose(jnp.imag(wt[:, :fh]), (0, 2, 1))[:, :, None, :]
    w_ny = wt[:, fh]                                            # (B, N)
    if istft_pallas_supported(cfg, t_pad, out_samps, t):
        # fused planar iSTFT consumes re/im/nyq planes directly — no
        # complex assembly, no frame materialization.  Beamform runs on
        # the full T_pad rows; padding rows may hold garbage frames but
        # the iSTFT's OLA indexing never reads rows >= n_frames.
        enh_re = jnp.sum(wr * re + wi * im, axis=1)         # (B, T_pad, FH)
        enh_im = jnp.sum(wr * im - wi * re, axis=1)
        ny_re = jnp.sum(jnp.real(w_ny)[:, :, None] * nyq, axis=1)
        return inverse_stft_pallas_planar(enh_re, enh_im, ny_re, cfg,
                                          n_frames=t, nsamps=out_samps,
                                          interpret=interpret)
    re_v = re[..., :t, :]
    im_v = im[..., :t, :]
    enh_re = jnp.sum(wr * re_v + wi * im_v, axis=1)             # (B, T, FH)
    enh_im = jnp.sum(wr * im_v - wi * re_v, axis=1)
    # Nyquist bin: conj(w_ny) . real obs
    ny_re = jnp.sum(jnp.real(w_ny)[:, :, None] * nv, axis=1)    # (B, T)
    ny_im = jnp.sum(-jnp.imag(w_ny)[:, :, None] * nv, axis=1)
    enh = jax.lax.complex(
        jnp.concatenate([enh_re, ny_re[..., None]], axis=-1),
        jnp.concatenate([enh_im, ny_im[..., None]], axis=-1))   # (B, T, F)
    return inverse_stft(enh, cfg, nsamps=out_samps)


def fused_online_supported(cfg: StftConfig, num_mics: int, nsamps: int,
                           out_samps: int, chunk: int) -> bool:
    from setk_tpu.ops.pallas.fused_mvdr import fused_online_supported \
        as _sup
    return _sup(cfg, num_mics, nsamps, out_samps, chunk)


def mvdr_enhance_fused_online(wav: jax.Array,
                              mask_s: jax.Array,
                              cfg: StftConfig,
                              chunk_size: int,
                              alpha: float = 0.8,
                              power_iters: int = 15,
                              nsamps: int | None = None,
                              interpret: bool = False) -> jax.Array:
    """Online (chunked EMA) MVDR through the fused kernel pair.

    Semantics of beamformer.online_supervised_run with the power-
    iteration steer (reference --update-periods streaming,
    /root/reference/src/apply-supervised-mvdr.cc:196-226): per-chunk
    masked covariances EMA-blended with R <- alpha R + (1-alpha) R_c
    (first chunk initializes), per-chunk MVDR weights, each chunk
    beamformed with its own weights.  The whole analysis+EMA+solve runs
    inside kernel A (per-chunk WEIGHTS are the only intermediate that
    touches HBM); kernel B recomputes the DFT and applies the per-chunk
    weights before the shared inverse DIT + overlap-add.  Requires
    chunk_size | 128 (the kernel's frame quarter), chunk_size >= 8.
    """
    import numpy as np
    from setk_tpu.dsp.window import wss_inverse_blocks
    from setk_tpu.ops.pallas.fused_mvdr import (
        _T_PAD, beamform_istft_online_pallas, stft_covar_online_pallas)

    b, n, s = wav.shape
    t = cfg.num_frames(s)
    fh = cfg.n_fft // 2
    hop = cfg.frame_hop
    out_samps = nsamps if nsamps is not None else s
    window_key = np.asarray(cfg.padded_window, np.float64).tobytes()

    wavb = wav.reshape(b, n, s // hop, hop)
    edges = jnp.stack([wav[..., fh:0:-1], wav[..., -2:-(fh + 2):-1]],
                      axis=2)
    m32 = mask_s.astype(jnp.float32)
    mask0 = jnp.pad(m32[..., :fh], ((0, 0), (0, _T_PAD - t), (0, 0)))
    mask_ny = jnp.pad(
        jnp.broadcast_to(m32[..., fh:fh + 1], (b, t, 128)),
        ((0, 0), (0, _T_PAD - t), (0, 0)))

    wcat = stft_covar_online_pallas(wavb, edges, mask0, mask_ny,
                                    window_key, n_valid_t=t,
                                    chunk=chunk_size, alpha=float(alpha),
                                    power_iters=power_iters,
                                    interpret=interpret)
    nblk_out = out_samps // hop
    wss_inv = jnp.asarray(
        wss_inverse_blocks(cfg.padded_window, t, hop, cfg.n_fft,
                           out_samps))
    out = beamform_istft_online_pallas(wavb, edges, wcat, wss_inv,
                                       window_key, nblk_out=nblk_out,
                                       chunk=chunk_size,
                                       interpret=interpret)
    return out.reshape(b, nblk_out * hop)
