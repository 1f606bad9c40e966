"""Pallas TPU kernel: fused framing + windowed real-DFT (forward STFT).

The XLA matmul-DFT path (dsp/dft.py) materializes the overlapped frame
matrix to HBM (2x the signal), converts it to bf16 hi/lo copies, and
re-reads them across the 3-pass ``precision=high`` product — on this
chip (~200 GB/s practical HBM streaming) the stage is traffic-bound, not
MXU-bound.  This kernel reads the signal hop-blocks, assembles each
frame tile in VMEM, performs the f32 -> bf16 hi/lo split there, and runs
the 3-pass product (x_hi B_hi + x_hi B_lo + x_lo B_hi — the same error
compensation XLA's "high" uses) against a window-folded basis, writing
the spectrum once.

Layout contract (the whole point): the planar outputs are
``(B, N, T_pad, F_pad)`` float32 with T padded to a 128-frame quantum
and F padded to the 128-lane quantum — exactly the block layout the
fused covariance kernel (ops/pallas/covariance_pair.py) consumes, so
NOTHING between STFT and covariance repacks, pads, or interleaves.
Slices of the valid region fuse into downstream elementwise consumers.

Grid design lesson (measured): frames are independent rows, so the
kernel flattens (B, T) into one row axis and runs a 1-D grid of big row
tiles — a fine (B, T-tile) grid paid ~10x in per-step overheads.

Only the 50%-overlap power-of-two configuration (n_fft == 2 * hop, the
toolkit default: /root/reference/scripts/sptk/libs/opts.py:26-49) takes
this path; other geometries fall back to the XLA matmul in dsp/stft.py.
"""

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "stft_pallas_supported", "forward_stft_pallas",
    "forward_stft_pallas_planar"
]

_T_QUANT = 128  # frame-count padding quantum (per utterance)
_R_TILE = 512   # flattened frame rows per kernel step
_LANES = 128


def _split_hi_lo(x64: np.ndarray):
    hi = np.asarray(x64, np.float32).astype(jnp.bfloat16)
    lo = (np.asarray(x64, np.float32) -
          np.asarray(hi, np.float32)).astype(jnp.bfloat16)
    return np.asarray(hi), np.asarray(lo)


@lru_cache(maxsize=None)
def _aligned_basis(n_fft: int, f_pad: int, window_key):
    """(B_hi, B_lo) bf16 (n_fft, 2*f_pad): [w·cos_k | w·(-sin_k)], each
    half lane-padded with zero columns so re/im split on a tile edge."""
    window = np.frombuffer(window_key, dtype=np.float64)
    f = n_fft // 2 + 1
    n = np.arange(n_fft)[:, None]
    k = np.arange(f)[None, :]
    ang = 2.0 * np.pi * n * k / n_fft
    cos_b = np.cos(ang) * window[:, None]
    msin_b = -np.sin(ang) * window[:, None]
    full = np.zeros((n_fft, 2 * f_pad))
    full[:, :f] = cos_b
    full[:, f_pad:f_pad + f] = msin_b
    return _split_hi_lo(full)


def _stft_kernel(f_pad, x0_ref, x1_ref, bhi_ref, blo_ref, re_ref, im_ref):
    frames = jnp.concatenate([x0_ref[...], x1_ref[...]], axis=-1)  # (R, n_fft)
    x_hi = frames.astype(jnp.bfloat16)
    x_lo = (frames - x_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    b_hi = bhi_ref[...]
    b_lo = blo_ref[...]
    out = jnp.dot(x_hi, b_hi, preferred_element_type=jnp.float32)
    out += jnp.dot(x_hi, b_lo, preferred_element_type=jnp.float32)
    out += jnp.dot(x_lo, b_hi, preferred_element_type=jnp.float32)
    re_ref[...] = out[:, :f_pad]
    im_ref[...] = out[:, f_pad:]


@partial(jax.jit, static_argnames=("n_fft", "f_pad", "interpret"))
def _stft_pallas_blocks(x0, x1, b_hi, b_lo, n_fft, f_pad, interpret):
    """x0/x1: (rows, hop) leading/trailing hop-block of each frame row."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    rows, hop = x0.shape
    grid = (rows // _R_TILE,)
    sig_spec = pl.BlockSpec((_R_TILE, hop), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    basis_spec = pl.BlockSpec((n_fft, 2 * f_pad), lambda i: (0, 0),
                              memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((_R_TILE, f_pad), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((rows, f_pad), jnp.float32)
    return pl.pallas_call(
        partial(_stft_kernel, f_pad),
        grid=grid,
        in_specs=[sig_spec, sig_spec, basis_spec, basis_spec],
        out_specs=[out_spec, out_spec],
        out_shape=[out_shape, out_shape],
        interpret=interpret,
    )(x0, x1, b_hi, b_lo)


def stft_pallas_supported(cfg) -> bool:
    return cfg.n_fft == 2 * cfg.frame_hop and cfg.n_fft % 256 == 0


def forward_stft_pallas_planar(samps: jax.Array, cfg,
                               interpret: bool = False):
    """(..., S) real samples -> (re, im) planar float32 spectra of shape
    ``(..., T_pad, F_pad)`` (lane-padded bins, quantized frame count).

    Valid region: ``[..., :cfg.num_frames(S), :cfg.num_bins]``; padding
    is exact zeros in F (zero basis columns) and finite garbage frames in
    T (they map beyond the valid sample range of the inverse transform).
    Matches dsp.stft.forward_stft(impl="matmul", precision="high").
    """
    if not stft_pallas_supported(cfg):
        raise ValueError(
            "pallas stft requires n_fft == 2*hop, n_fft % 256 == 0")
    n_fft, hop = cfg.n_fft, cfg.frame_hop
    f_pad = -(-cfg.num_bins // _LANES) * _LANES
    lead = samps.shape[:-1]
    s = samps.shape[-1]
    x = samps.reshape(-1, s)
    if cfg.center:
        x = jnp.pad(x, ((0, 0), (n_fft // 2, n_fft // 2)), mode="reflect")
    n_samps = x.shape[-1]
    n_frames = 1 + (n_samps - n_fft) // hop
    t_pad = -(-n_frames // _T_QUANT) * _T_QUANT
    # hop-block views: frame t = [blocks[t] | blocks[t+1]]
    need = (t_pad + 1) * hop
    x = jnp.pad(x, ((0, 0), (0, max(0, need - n_samps))))
    blocks = x[:, :need].reshape(x.shape[0], t_pad + 1, hop)
    bsz = x.shape[0]
    # frames are independent rows: flatten (B, T_pad) so the kernel runs
    # a 1-D grid of big row tiles (fine grids pay per-step overhead)
    x0 = blocks[:, :t_pad].reshape(bsz * t_pad, hop)
    x1 = blocks[:, 1:t_pad + 1].reshape(bsz * t_pad, hop)
    rpad = (-x0.shape[0]) % _R_TILE
    if rpad:
        x0 = jnp.pad(x0, ((0, rpad), (0, 0)))
        x1 = jnp.pad(x1, ((0, rpad), (0, 0)))
    b_hi, b_lo = _aligned_basis(
        n_fft, f_pad, np.asarray(cfg.padded_window, np.float64).tobytes())
    re, im = _stft_pallas_blocks(x0, x1, jnp.asarray(b_hi),
                                 jnp.asarray(b_lo), n_fft, f_pad, interpret)
    shape = (*lead, t_pad, f_pad)
    return re[:bsz * t_pad].reshape(shape), im[:bsz * t_pad].reshape(shape)


def forward_stft_pallas(samps: jax.Array, cfg,
                        interpret: bool = False) -> jax.Array:
    """(..., S) real samples -> (..., T, F) complex64 (librosa semantics).

    Convenience wrapper over the planar kernel; the fused pipelines use
    ``forward_stft_pallas_planar`` directly to keep the padded planar
    layout flowing into the covariance kernel.
    """
    re, im = forward_stft_pallas_planar(samps, cfg, interpret=interpret)
    t = cfg.num_frames(samps.shape[-1])
    f = cfg.num_bins
    return jax.lax.complex(re[..., :t, :f], im[..., :t, :f])
