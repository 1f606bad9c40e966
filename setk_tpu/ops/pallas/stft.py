"""Pallas TPU kernel: fused framing + windowed real-DFT (forward STFT).

The XLA matmul-DFT path (dsp/dft.py) materializes the overlapped frame
matrix to HBM (2x the signal), converts it to bf16 hi/lo copies, and
re-reads them across the 3-pass ``precision=high`` product — on this
chip (~200 GB/s practical HBM streaming) the stage is traffic-bound, not
MXU-bound.  This kernel reads hop-block views of the padded signal
directly (auto-pipelined BlockSpec input: NO frame or x0/x1
materialization in HBM), assembles each frame tile in VMEM, performs
the f32 -> bf16 hi/lo split there, and runs the 3-pass product
(x_hi B_hi + x_hi B_lo + x_lo B_hi — the same error compensation XLA's
"high" uses) against a window-folded basis, writing the spectrum once.

Layout contract v2 (bytes over beauty): the planar outputs are
  re, im  (B, N, T_pad, F_HALF)   F_HALF = n_fft/2 — EXACT lane tiles
  nyq     (B, N, T_pad)           the real-valued Nyquist bin
T is padded to a 128-frame quantum.  With the toolkit default n_fft=512
this stores 2x256 lanes per frame instead of the v1 kernel's 2x384
(bins 257 padded up to the lane quantum) — a 33% cut of the spectrum
traffic, the dominant term of the fused pipeline.  The Nyquist bin rides
a basis column of the same matmul and lands in its own tiny plane; the
fused covariance kernel (ops/pallas/covariance_pair.py) consumes the
256-lane planes unchanged and the pipeline handles bin 256 as a cheap
XLA sidecar (enhance/pipeline.py).

Grid design lesson (measured): frames are independent rows, so the
kernel runs one grid step per (utterance-channel, frame-chunk) with the
whole chunk's frames as sublanes — a fine (B, T-tile) grid paid ~10x in
per-step overheads.

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
    "forward_stft_pallas_planar", "istft_pallas_supported",
    "inverse_stft_pallas_planar"
]

_T_QUANT = 128  # frame-count padding quantum (per utterance)
_T_MAX = 512    # frames per kernel step (VMEM budget ~7 MB at n_fft 512)
_LANES = 128


def _split_hi_lo(x64: np.ndarray):
    hi = np.asarray(x64, np.float32).astype(jnp.bfloat16)
    lo = (np.asarray(x64, np.float32) -
          np.asarray(hi, np.float32)).astype(jnp.bfloat16)
    return np.asarray(hi), np.asarray(lo)


@lru_cache(maxsize=None)
def _folded_basis(n_fft: int, window_key):
    """(B_hi, B_lo) bf16 (n_fft, 2*F_HALF + 128): [w·cos_k | w·(-sin_k)]
    for k = 0..F_HALF-1, then the Nyquist column w·cos_{F_HALF} = w·(-1)^n
    followed by 127 zero columns (lane-quantum padding)."""
    window = np.frombuffer(window_key, dtype=np.float64)
    f_half = n_fft // 2
    n = np.arange(n_fft)[:, None]
    k = np.arange(f_half)[None, :]
    ang = 2.0 * np.pi * n * k / n_fft
    cos_b = np.cos(ang) * window[:, None]
    msin_b = -np.sin(ang) * window[:, None]
    full = np.zeros((n_fft, 2 * f_half + _LANES))
    full[:, :f_half] = cos_b
    full[:, f_half:2 * f_half] = msin_b
    # Nyquist bin: cos(2 pi n (n_fft/2) / n_fft) = (-1)^n (sin part is 0)
    full[:, 2 * f_half] = np.cos(np.pi * np.arange(n_fft)) * window
    return _split_hi_lo(full)


def _dft_core(x, tile, f_half, bt_hi_ref, bt_lo_ref, bb_hi_ref, bb_lo_ref,
              re_ref, im_ref, nyq_ref):
    # frame t = [x[t] | x[t+1]] hop blocks; instead of concatenating
    # (Mosaic cannot concat sublane-offset slices) split the basis at
    # row `hop`: frames @ B == x0 @ B_top + x1 @ B_bottom
    x0 = x[:tile]
    x1 = x[1:tile + 1]
    x0h = x0.astype(jnp.bfloat16)
    x0l = (x0 - x0h.astype(jnp.float32)).astype(jnp.bfloat16)
    x1h = x1.astype(jnp.bfloat16)
    x1l = (x1 - x1h.astype(jnp.float32)).astype(jnp.bfloat16)
    dot = partial(jnp.dot, preferred_element_type=jnp.float32)
    out = dot(x0h, bt_hi_ref[...]) + dot(x1h, bb_hi_ref[...])
    out += dot(x0h, bt_lo_ref[...]) + dot(x1h, bb_lo_ref[...])
    out += dot(x0l, bt_hi_ref[...]) + dot(x1l, bb_hi_ref[...])
    re_ref[0] = out[:, :f_half]
    im_ref[0] = out[:, f_half:2 * f_half]
    nyq_ref[0] = out[:, 2 * f_half:2 * f_half + 1]


def _stft_kernel(tile, f_half, x_ref, bt_hi_ref, bt_lo_ref, bb_hi_ref,
                 bb_lo_ref, re_ref, im_ref, nyq_ref):
    _dft_core(x_ref[0], tile, f_half, bt_hi_ref, bt_lo_ref, bb_hi_ref,
              bb_lo_ref, re_ref, im_ref, nyq_ref)


def _stft_kernel_edges(tile, nblk, f_half, wav_ref, edge_ref, bt_hi_ref,
                       bt_lo_ref, bb_hi_ref, bb_lo_ref, re_ref, im_ref,
                       nyq_ref, x_scr):
    # assemble the center-padded hop-block sequence in VMEM — the wav
    # blocks come straight from the caller's (bsz, S) signal as a
    # ZERO-COPY reshape (no padded-signal materialization in HBM; the
    # XLA concat pad measured ~6 ms of the bench step).  With 50%
    # overlap the reflect pad is exactly one hop block per side.
    hop = wav_ref.shape[-1]
    x_scr[0:1] = edge_ref[0, 0:1]                    # reflect head
    x_scr[1:nblk + 1] = wav_ref[0]
    x_scr[nblk + 1:nblk + 2] = edge_ref[0, 1:2]      # reflect tail
    if nblk + 2 < tile + 1:
        x_scr[nblk + 2:tile + 1] = jnp.zeros(
            (tile - 1 - nblk, hop), jnp.float32)
    _dft_core(x_scr[...], tile, f_half, bt_hi_ref, bt_lo_ref, bb_hi_ref,
              bb_lo_ref, re_ref, im_ref, nyq_ref)


@partial(jax.jit, static_argnames=("n_fft", "interpret"))
def _stft_pallas_blocks(xb, bt_hi, bt_lo, bb_hi, bb_lo, n_fft, interpret):
    """xb: (rows, tile+1, hop) hop-block views, one frame chunk per row."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    rows, tile_p1, hop = xb.shape
    tile = tile_p1 - 1
    f_half = n_fft // 2
    grid = (rows,)
    sig_spec = pl.BlockSpec((1, tile_p1, hop), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    basis_spec = pl.BlockSpec((hop, 2 * f_half + _LANES), lambda i: (0, 0),
                              memory_space=pltpu.VMEM)
    spec_spec = pl.BlockSpec((1, tile, f_half), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    nyq_spec = pl.BlockSpec((1, tile, 1), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_stft_kernel, tile, f_half),
        grid=grid,
        in_specs=[sig_spec] + [basis_spec] * 4,
        out_specs=[spec_spec, spec_spec, nyq_spec],
        out_shape=[
            jax.ShapeDtypeStruct((rows, tile, f_half), jnp.float32),
            jax.ShapeDtypeStruct((rows, tile, f_half), jnp.float32),
            jax.ShapeDtypeStruct((rows, tile, 1), jnp.float32),
        ],
        interpret=interpret,
    )(xb, bt_hi, bt_lo, bb_hi, bb_lo)


@partial(jax.jit, static_argnames=("n_fft", "t_pad", "interpret"))
def _stft_pallas_wavblocks(wavb, edges, bt_hi, bt_lo, bb_hi, bb_lo, n_fft,
                           t_pad, interpret):
    """Pad-free path: wavb (bsz, nblk, hop) zero-copy signal blocks +
    edges (bsz, 8, hop) [reflect-head, reflect-tail, 0...]."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    bsz, nblk, hop = wavb.shape
    tile = t_pad
    f_half = n_fft // 2
    wav_spec = pl.BlockSpec((1, nblk, hop), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    edge_spec = pl.BlockSpec((1, 8, hop), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    basis_spec = pl.BlockSpec((hop, 2 * f_half + _LANES), lambda i: (0, 0),
                              memory_space=pltpu.VMEM)
    spec_spec = pl.BlockSpec((1, tile, f_half), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    nyq_spec = pl.BlockSpec((1, tile, 1), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_stft_kernel_edges, tile, nblk, f_half),
        grid=(bsz,),
        in_specs=[wav_spec, edge_spec] + [basis_spec] * 4,
        out_specs=[spec_spec, spec_spec, nyq_spec],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, tile, f_half), jnp.float32),
            jax.ShapeDtypeStruct((bsz, tile, f_half), jnp.float32),
            jax.ShapeDtypeStruct((bsz, tile, 1), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((tile + 1, hop), jnp.float32)],
        interpret=interpret,
    )(wavb, edges, bt_hi, bt_lo, bb_hi, bb_lo)


def stft_pallas_supported(cfg) -> bool:
    return cfg.n_fft == 2 * cfg.frame_hop and cfg.n_fft % 256 == 0


def forward_stft_pallas_planar(samps: jax.Array, cfg,
                               interpret: bool = False):
    """(..., S) real samples -> (re, im, nyq) planar float32 spectra.

    re/im: ``(..., T_pad, F_HALF)`` with F_HALF = n_fft//2 exact lane
    tiles (bins 0..F_HALF-1); nyq: ``(..., T_pad)`` real Nyquist bin.
    Valid frames: ``[..., :cfg.num_frames(S), :]``; T padding rows are
    finite garbage frames (they map beyond the valid sample range of the
    inverse transform).  Numerically matches
    dsp.stft.forward_stft(impl="matmul", precision="high").
    """
    if not stft_pallas_supported(cfg):
        raise ValueError(
            "pallas stft requires n_fft == 2*hop, n_fft % 256 == 0")
    n_fft, hop = cfg.n_fft, cfg.frame_hop
    lead = samps.shape[:-1]
    s = samps.shape[-1]
    x = samps.reshape(-1, s)
    bsz = x.shape[0]
    n_frames = cfg.num_frames(s)
    t_pad = -(-n_frames // _T_QUANT) * _T_QUANT
    if t_pad > _T_MAX:
        # uniform _T_MAX-frame chunks (round the pad up to the chunk size)
        t_pad = -(-t_pad // _T_MAX) * _T_MAX
        tile = _T_MAX
    else:
        tile = t_pad
    n_chunks = t_pad // tile
    c = n_fft // 2 if cfg.center else 0
    b_hi, b_lo = _folded_basis(
        n_fft, np.asarray(cfg.padded_window, np.float64).tobytes())
    basis = (jnp.asarray(b_hi[:hop]), jnp.asarray(b_lo[:hop]),
             jnp.asarray(b_hi[hop:]), jnp.asarray(b_lo[hop:]))
    if cfg.center and n_chunks == 1 and s % hop == 0:
        # pad-free fast path: the signal blocks are a zero-copy reshape,
        # the one-hop-block reflect edges ride a tiny side input and the
        # padded sequence is assembled in VMEM scratch
        head = x[:, c:0:-1]
        tail_r = x[:, -2:-(c + 2):-1]
        edges = jnp.pad(jnp.stack([head, tail_r], axis=1),
                        ((0, 0), (0, 6), (0, 0)))
        wavb = x.reshape(bsz, s // hop, hop)
        re, im, nyq = _stft_pallas_wavblocks(wavb, edges, *basis,
                                             n_fft=n_fft, t_pad=t_pad,
                                             interpret=interpret)
    else:
        # general path: one concat materializes the padded signal
        # (reflect head, signal, reflect tail, zero tail to block span)
        need = (t_pad + 1) * hop
        tail = need - (s + 2 * c)
        parts = []
        if c:
            parts.append(x[:, c:0:-1])
        parts.append(x)
        if c:
            parts.append(x[:, -2:-(c + 2):-1])
        if tail > 0:
            parts.append(jnp.zeros((bsz, tail), x.dtype))
        x = jnp.concatenate(parts, axis=-1) if len(parts) > 1 else x
        if n_chunks == 1:
            xb = x[:, :need].reshape(bsz, t_pad + 1, hop)
        else:
            # chunk rows overlap by one hop block: one small gather copy
            starts = np.arange(n_chunks) * tile * hop
            idx = starts[:, None] + np.arange((tile + 1) * hop)[None, :]
            xb = x[:, idx].reshape(bsz * n_chunks, tile + 1, hop)
        re, im, nyq = _stft_pallas_blocks(xb, *basis, n_fft=n_fft,
                                          interpret=interpret)
    f_half = n_fft // 2
    shape = (*lead, t_pad, f_half)
    return (re.reshape(shape), im.reshape(shape),
            nyq.reshape(*lead, t_pad))


def _istft_kernel(nblk_out, er_ref, ei_ref, ny_ref, brt_hi, brt_lo, brb_hi,
                  brb_lo, bit_hi, bit_lo, bib_hi, bib_lo, nyt_ref, nyb_ref,
                  wss_ref, out_ref):
    # frames = enh @ B_syn, then overlap-add at 50% = audio block j gets
    # frames[j][:hop] + frames[j-1][hop:].  Split the synthesis basis at
    # COLUMN hop: P = enh @ B[:, :hop], Q = enh @ B[:, hop:], then
    # out[j] = (P[j+1] + Q[j]) * wss_inv[j] — the +1 row offset IS the
    # center trim (half-window = one hop block at 50% overlap), and the
    # trailing trim just never reads the last Q row.
    er = er_ref[0]                    # (T_pad, F_HALF)
    ei = ei_ref[0]
    ny = ny_ref[0]                    # (T_pad, 1) — Nyquist bin is real
    er_h = er.astype(jnp.bfloat16)
    er_l = (er - er_h.astype(jnp.float32)).astype(jnp.bfloat16)
    ei_h = ei.astype(jnp.bfloat16)
    ei_l = (ei - ei_h.astype(jnp.float32)).astype(jnp.bfloat16)
    dot = partial(jnp.dot, preferred_element_type=jnp.float32)
    p = dot(er_h, brt_hi[...]) + dot(er_h, brt_lo[...])
    p += dot(er_l, brt_hi[...])
    p += dot(ei_h, bit_hi[...]) + dot(ei_h, bit_lo[...])
    p += dot(ei_l, bit_hi[...])
    p += ny * nyt_ref[...]            # f32 rank-1: Nyquist synthesis row
    q = dot(er_h, brb_hi[...]) + dot(er_h, brb_lo[...])
    q += dot(er_l, brb_hi[...])
    q += dot(ei_h, bib_hi[...]) + dot(ei_h, bib_lo[...])
    q += dot(ei_l, bib_hi[...])
    q += ny * nyb_ref[...]
    out_ref[0] = (p[1:nblk_out + 1] + q[:nblk_out]) * wss_ref[...]


@partial(jax.jit, static_argnames=("nblk_out", "interpret"))
def _istft_pallas(er, ei, ny, bases, nyrows, wss_inv, nblk_out, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    bsz, t_pad, f_half = er.shape
    hop = wss_inv.shape[-1]
    spec_spec = pl.BlockSpec((1, t_pad, f_half), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    ny_spec = pl.BlockSpec((1, t_pad, 1), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    basis_spec = pl.BlockSpec((f_half, hop), lambda i: (0, 0),
                              memory_space=pltpu.VMEM)
    nyrow_spec = pl.BlockSpec((1, hop), lambda i: (0, 0),
                              memory_space=pltpu.VMEM)
    wss_spec = pl.BlockSpec((nblk_out, hop), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, nblk_out, hop), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_istft_kernel, nblk_out),
        grid=(bsz,),
        in_specs=([spec_spec, spec_spec, ny_spec] + [basis_spec] * 8 +
                  [nyrow_spec] * 2 + [wss_spec]),
        out_specs=[out_spec],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, nblk_out, hop), jnp.float32)
        ],
        interpret=interpret,
    )(er, ei, ny, *bases, *nyrows, wss_inv)[0]


@lru_cache(maxsize=None)
def _syn_basis(n_fft: int, window_key):
    """Synthesis bases split for the planar iSTFT kernel: 8 bf16 hi/lo
    (F_HALF, hop) matmul blocks + 2 f32 (1, n_fft->hop) Nyquist rows."""
    from setk_tpu.dsp import dft
    window = np.frombuffer(window_key, dtype=np.float64)
    b_re, b_im = dft.irdft_basis(n_fft, window)  # (F, n_fft) f32
    b_re = np.asarray(b_re, np.float64)
    b_im = np.asarray(b_im, np.float64)
    hop = n_fft // 2
    f_half = n_fft // 2
    out = []
    for cols in (slice(0, hop), slice(hop, n_fft)):
        for b in (b_re, b_im):
            hi, lo = _split_hi_lo(b[:f_half, cols])
            out.extend([hi, lo])
    # reorder to (re-top, re-bot, im-top, im-bot) hi/lo pairs
    brt_hi, brt_lo, bit_hi, bit_lo, brb_hi, brb_lo, bib_hi, bib_lo = out
    bases = (brt_hi, brt_lo, brb_hi, brb_lo, bit_hi, bit_lo, bib_hi,
             bib_lo)
    # Nyquist synthesis row: b_im[f_half] is identically 0 (sin at
    # Nyquist), so only the real row contributes — kept f32 (rank-1
    # elementwise add, no MXU, no hi/lo needed)
    nyrows = (np.asarray(b_re[f_half:f_half + 1, :hop], np.float32),
              np.asarray(b_re[f_half:f_half + 1, hop:], np.float32))
    return bases, nyrows


def istft_pallas_supported(cfg, t_pad: int, nsamps: int,
                           n_frames: int) -> bool:
    return (stft_pallas_supported(cfg) and cfg.center and t_pad <= _T_MAX
            and n_frames <= t_pad
            and nsamps == (n_frames - 1) * cfg.frame_hop)


def inverse_stft_pallas_planar(er: jax.Array, ei: jax.Array, ny: jax.Array,
                               cfg, n_frames: int, nsamps: int,
                               interpret: bool = False) -> jax.Array:
    """Planar fused iSTFT: (..., T_pad, F_HALF) re/im + (..., T_pad)
    Nyquist-bin real part -> (..., nsamps) samples.

    Semantics match dsp.stft.inverse_stft(impl="matmul",
    precision="high") for the hop-aligned center case
    (nsamps == (n_frames - 1) * hop); rows >= n_frames must be zeros
    (they are, from the forward kernel's zero tail blocks).  The
    squared-window envelope division folds in as a precomputed
    reciprocal multiply; both center trims fold into row indexing.
    """
    from setk_tpu.dsp.window import wss_inverse_blocks
    n_fft, hop = cfg.n_fft, cfg.frame_hop
    *lead, t_pad, f_half = er.shape
    bsz = int(np.prod(lead)) if lead else 1
    nblk_out = nsamps // hop
    bases, nyrows = _syn_basis(
        n_fft, np.asarray(cfg.padded_window, np.float64).tobytes())
    wss_inv = wss_inverse_blocks(cfg.padded_window, n_frames, hop, n_fft,
                                 nsamps)
    out = _istft_pallas(er.reshape(bsz, t_pad, f_half),
                        ei.reshape(bsz, t_pad, f_half),
                        ny.reshape(bsz, t_pad, 1),
                        tuple(jnp.asarray(b) for b in bases),
                        tuple(jnp.asarray(r) for r in nyrows),
                        jnp.asarray(wss_inv), nblk_out, interpret)
    return out.reshape(*lead, nsamps)


def forward_stft_pallas(samps: jax.Array, cfg,
                        interpret: bool = False) -> jax.Array:
    """(..., S) real samples -> (..., T, F) complex64 (librosa semantics).

    Convenience wrapper over the planar kernel; the fused pipelines use
    ``forward_stft_pallas_planar`` directly to keep the padded planar
    layout flowing into the covariance kernel.
    """
    re, im, nyq = forward_stft_pallas_planar(samps, cfg, interpret=interpret)
    t = cfg.num_frames(samps.shape[-1])
    re_full = jnp.concatenate([re[..., :t, :], nyq[..., :t, None]], axis=-1)
    im_full = jnp.pad(im[..., :t, :], [(0, 0)] * (im.ndim - 1) + [(0, 1)])
    return jax.lax.complex(re_full, im_full)
