"""Zero-spectrum-materialization MVDR pipeline kernels (TPU fast path).

The planar pipeline v2 (ops/pallas/stft.py + covariance_pair.py) is
DMA-bound: measured Pallas/XLA streaming tops out ~210 GB/s on this
chip, and the (B, N, T, F) planar spectra cost ~0.8 GB to write plus
~1.6 GB to re-read (covariance + beamform + iSTFT) per bench step.
These kernels never let the spectrum leave VMEM:

  kernel A (stft_covar):      wav -> [framing + windowed radix-2 DIF
                              DFT in VMEM] -> mask-weighted Rs/Rn pair
                              accumulation -> only the (B, N, N, L)
                              covariance numerators reach HBM.
  kernel B (beamform_istft):  wav -> [same DFT recomputed in VMEM] ->
                              w^H y beamform -> inverse DIT + synthesis
                              window + overlap-add -> samples.

Total HBM traffic falls from ~3.3 GB to ~0.9 GB per bench step: the wav
is read twice, because recomputing the DFT (~0.3 GFLOP/MB) is ~4x
cheaper than the spectrum round trip at the chip's ~210 GB/s.

**Radix-2 DIF with scrambled frequency lanes.**  The windowed frame
y = [w0*x0 | w1*x1] (50%-overlap hop blocks) splits as
    a = w0*x0 + w1*x1,    d = w0*x0 - w1*x1          (both real, 256)
with DFT512(y)[2k] = DFT256(a)[k] and DFT512(y)[2k+1] = the
"odd-frequency" real-input DFT of d (the DIF twiddle exp(-i pi n/256)
folds into that basis) — ~50% fewer matmul MACs than the direct
folded-basis DFT, with the butterflies as two VPU adds.  Bins stay in
*scrambled* (even|odd) order through the whole pipeline: covariance,
solve and beamforming are bin-order-agnostic, and the inverse kernel's
DIT basis is built in the same order, so nothing ever unscrambles.
Each 3-pass product (the bf16 hi/lo error compensation XLA's "high"
precision uses) is laid out as ONE K-stacked matmul so the MXU
accumulates the passes internally, and all mics stack along the matmul
M dimension so each quarter's DFT is two big dots.  Audio may enter as
int16 (the decoder's native output): conversion happens in VMEM with
the 1/32768 scale folded into the analysis window.

Spectrum lane layout inside the kernels (n_fft = 512 only; other
geometries take the planar v2 or XLA paths):
    [ re_e 128 | im_e 128 | ny 1+127z | re_o 128 | im_o 128 | 128 z ]
where re_e lane k is bin 2k, re_o lane k is bin 2k+1, ny is the real
Nyquist bin 256.  The covariance output keeps a compact order
    [ re_e | re_o | ny ... ]  (lanes 0..256 = all 257 bins, scrambled)
so the MVDR solve consumes a plain slice — no gather anywhere.

Reference semantics: apply_adaptive_beamformer.py:74-180 ->
libs/beamformer.py:87-103 (compute_covar), :515-539 (MVDR), with
mask_n = 1 - mask_s; STFT/iSTFT per libs/utils.py:96-173 (librosa
center/hann conventions — parity suite in tests/test_stft.py).
"""

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "fused_mvdr_supported", "lane_permutation", "stft_covar_pallas",
    "beamform_istft_pallas"
]

_LANES = 128
_QUARTER = 128      # frames per inner step
_T_PAD = 512        # frame capacity per utterance (> 8 s at 512/256)
_NFFT = 512
_HOP = 256
_FH = 256           # n_fft // 2
_L = 768            # spectrum lane count (6 tiles)


def fused_mvdr_supported(cfg, num_mics: int, nsamps: int,
                         out_samps: int) -> bool:
    """The fused path covers the toolkit-default STFT geometry."""
    t = cfg.num_frames(nsamps)
    return (cfg.n_fft == _NFFT and cfg.frame_hop == _HOP and cfg.center
            and num_mics <= 8 and nsamps % _HOP == 0 and t <= _T_PAD
            and nsamps >= _NFFT  # reflect edges need two hop blocks
            and out_samps == (t - 1) * _HOP)


def lane_permutation():
    """bin-by-lane order for lanes 0..256: [0,2,..,254, 1,3,..,255, 256]."""
    return np.concatenate(
        [np.arange(0, _FH, 2), np.arange(1, _FH, 2), [_FH]])


from setk_tpu.ops.pallas.common import split_hi_lo as _split_hi_lo


@lru_cache(maxsize=None)
def _dif_bases(window_key, scale=1.0):
    """Forward DIF bases + window/twiddle vectors (host constants).

    BeK (768, 384) bf16: 3-pass K-stack [hi; lo; hi] for the real
    input a; columns [re_e 128 | im_e 128 | ny 1 + 127 zeros].
    BoK (768, 256) bf16: same for the real input d — the DIF twiddle
    folds into the basis (DFT512(y)[2k+1] = sum_n d[n]
    exp(-i pi (2k+1) n / 256), a real-input "odd-frequency" DFT), so
    no complex twiddle multiply and half the K of the two-operand form.
    """
    window = np.frombuffer(window_key, dtype=np.float64)
    m = _FH
    n = np.arange(m)
    k = np.arange(m // 2)
    ang = 2.0 * np.pi * n[:, None] * k[None, :] / m
    cosb = np.cos(ang)
    msinb = -np.sin(ang)
    nyc = np.cos(np.pi * n)[:, None]
    be = np.concatenate([cosb, msinb, nyc, np.zeros((m, 127))], axis=1)
    be_h, be_l = _split_hi_lo(be)
    bek = np.concatenate([be_h, be_l, be_h], axis=0)
    ang_o = np.pi * n[:, None] * (2 * k[None, :] + 1) / m
    bo = np.concatenate([np.cos(ang_o), -np.sin(ang_o)], axis=1)
    bo_h, bo_l = _split_hi_lo(bo)
    bok = np.concatenate([bo_h, bo_l, bo_h], axis=0)
    # an input sample scale (e.g. 1/32768 for int16 wav) folds into the
    # analysis window vectors; MVDR weights are scale-invariant so the
    # rest of the pipeline needs no change
    w0 = np.asarray(window[:_HOP] * scale, np.float32)
    w1 = np.asarray(window[_HOP:] * scale, np.float32)
    return (np.asarray(bek), np.asarray(bok), w0, w1)


@lru_cache(maxsize=None)
def _dit_inverse_bases(window_key):
    """Inverse DIT bases (synthesis window applied post-butterfly).

    For the scrambled half-spectrum [ere|eie|eny] / [ero|eio], the
    unwindowed frame x (512) satisfies (wk = 1 for bins 0/256 else 2,
    irDFT normalization 1/512 — conventions of dsp/dft.irdft_basis):
        ae[n] = sum_k wk/512 (ere_k cos(2 pi k n/256)
                              - eie_k sin(2 pi k n/256)) + eny (-1)^n/512
        od[n] = sum_k  2/512 (ero_k cos(pi(2k+1)n/256)
                              - eio_k sin(pi(2k+1)n/256))
        x[n] = ae[n] + od[n],   x[n+256] = ae[n] - od[n]
    synthesis frame = window * x; P/Q halves overlap-add at 50%.
    Returns AeK (1152, 256) bf16 3-pass K-stack for the (.., 384) input
    [ere|eie|eny-tile], AoK (768, 256) for [ero|eio], ws0/ws1 f32.
    """
    window = np.frombuffer(window_key, dtype=np.float64)
    m = _FH
    n = np.arange(m)
    k = np.arange(m // 2)
    wk = np.where(k == 0, 1.0, 2.0) / _NFFT
    ang_e = 2.0 * np.pi * k[:, None] * n[None, :] / m
    ae_re = wk[:, None] * np.cos(ang_e)             # ere rows
    ae_im = -wk[:, None] * np.sin(ang_e)            # eie rows
    ny_rows = np.zeros((_LANES, m))
    ny_rows[0] = np.cos(np.pi * n) / _NFFT          # eny lives in lane 0
    ae = np.concatenate([ae_re, ae_im, ny_rows], axis=0)   # (384, 256)
    ae_h, ae_l = _split_hi_lo(ae)
    aek = np.concatenate([ae_h, ae_l, ae_h], axis=0)       # (1152, 256)
    ang_o = np.pi * (2 * k[:, None] + 1) * n[None, :] / m
    ao_re = (2.0 / _NFFT) * np.cos(ang_o)
    ao_im = -(2.0 / _NFFT) * np.sin(ang_o)
    ao = np.concatenate([ao_re, ao_im], axis=0)            # (256, 256)
    ao_h, ao_l = _split_hi_lo(ao)
    aok = np.concatenate([ao_h, ao_l, ao_h], axis=0)       # (768, 256)
    ws0 = np.asarray(window[:_HOP], np.float32)
    ws1 = np.asarray(window[_HOP:], np.float32)
    return np.asarray(aek), np.asarray(aok), ws0, ws1


def _kstack3(x, scr, width):
    """3-pass K-stack of a real (rows, width) f32 tile into bf16 scratch
    (rows, 3*width): [hi | hi | lo] against bases [B_hi; B_lo; B_hi]
    gives x_h B_h + x_h B_l + x_l B_h — the "high"-precision sum."""
    xh = x.astype(jnp.bfloat16)
    xl = (x - xh.astype(jnp.float32)).astype(jnp.bfloat16)
    scr[:, 0 * width:1 * width] = xh
    scr[:, 1 * width:2 * width] = xh
    scr[:, 2 * width:3 * width] = xl


def _assemble_quarter(q, nblk, wav_ref, edge_ref, mic, x_scr):
    """Fill x_scr (129, hop) with padded hop blocks [q*128, q*128+128].

    Padded block j: j==0 head edge, 1<=j<=nblk wav[j-1], j==nblk+1 tail
    edge, else zero.  q is a python int (statically unrolled), so every
    slice below is static."""
    blo = q * _QUARTER           # first padded block id
    bhi = blo + _QUARTER + 1     # one past last (129 blocks)
    if blo == 0:
        x_scr[0:1] = edge_ref[0, mic, 0:1]
    w_lo = max(blo, 1) - 1       # wav block ids [w_lo, w_hi)
    w_hi = min(bhi, nblk + 1) - 1
    if w_hi > w_lo:
        pos = (w_lo + 1) - blo
        x_scr[pos:pos + (w_hi - w_lo)] = wav_ref[0, mic, w_lo:w_hi]
    if blo <= nblk + 1 < bhi:    # tail edge block (id nblk + 1)
        x_scr[nblk + 1 - blo:nblk + 2 - blo] = edge_ref[0, mic, 1:2]
    zpos = max(min(nblk + 2, bhi) - blo, 0)
    if zpos < _QUARTER + 1:
        x_scr[zpos:_QUARTER + 1] = jnp.zeros(
            (_QUARTER + 1 - zpos, _HOP), x_scr.dtype)


def _dif_quarter_all(n_mics, q, nblk, wav_ref, edge_ref, bek_ref, bok_ref,
                     w0_ref, w1_ref, x_scr, ke_scr, ko_scr):
    """Windowed radix-2 DIF DFT of one quarter's 128 frames for ALL mics,
    stacked along the matmul M dimension (mic m = rows m*128..m*128+127).

    The per-mic VPU work (frame assembly, windowed butterflies, bf16
    hi/lo splits) lands in two big K-stacked scratches so the whole
    quarter runs as TWO MXU dots — the earlier per-mic version
    alternated 12 small VPU/MXU sections and left the MXU idle in the
    bubbles.

    Returns (ev (n*128, 384): [re_e|im_e|ny+z], od (n*128, 256):
    [re_o|im_o])."""
    dot = partial(jnp.dot, preferred_element_type=jnp.float32)
    for mic in range(n_mics):
        _assemble_quarter(q, nblk, wav_ref, edge_ref, mic, x_scr)
        # int16 wav converts to f32 here (the 1/32768 rides w0/w1)
        y0 = x_scr[:_QUARTER].astype(jnp.float32) * w0_ref[...]
        y1 = x_scr[1:_QUARTER + 1].astype(jnp.float32) * w1_ref[...]
        a = y0 + y1
        d = y0 - y1
        r0 = mic * _QUARTER
        _kstack3(a, ke_scr.at[r0:r0 + _QUARTER], _HOP)
        _kstack3(d, ko_scr.at[r0:r0 + _QUARTER], _HOP)
    ev = dot(ke_scr[...], bek_ref[...])
    od = dot(ko_scr[...], bok_ref[...])
    return ev, od


def _stft_covar_kernel(n_mics, nblk, n_valid_t, wav_ref, edge_ref, mask_ref,
                       maskny_ref, permp_ref, bek_ref, bok_ref, w0_ref,
                       w1_ref, rs_re_ref, rs_im_ref, rn_re_ref, rn_im_ref,
                       x_scr, ke_scr, ko_scr):
    dot = partial(jnp.dot, preferred_element_type=jnp.float32)
    outs = (rs_re_ref, rs_im_ref, rn_re_ref, rn_im_ref)
    for o in outs:
        o[...] = jnp.zeros_like(o)
    # permute the natural-order mask into scrambled lane order with an
    # exact one-hot matmul (an XLA lane gather OR minor-dim pad each
    # measured 4-6 ms at the bench shape; the 0/1 matrix is exact in
    # bf16 and two mask hi/lo passes reconstruct f32 to ~2^-16 relative
    # — far inside tolerance).  The Nyquist-bin mask rides its own tiny
    # lane-broadcast plane: nyquist spectrum lanes 1..127 are zero, so
    # the broadcast is harmless there.
    ms_nat = mask_ref[0]                               # (512, 256)
    mh = ms_nat.astype(jnp.bfloat16)
    mlo = (ms_nat - mh.astype(jnp.float32)).astype(jnp.bfloat16)
    msp = dot(mh, permp_ref[...]) + dot(mlo, permp_ref[...])  # (512, 256)
    zero_t = jnp.zeros((_QUARTER, _LANES), jnp.float32)
    for q in range(_T_PAD // _QUARTER):
        if q * _QUARTER > nblk + 1:
            break  # quarter holds only zero pad blocks (static skip)
        ev, od = _dif_quarter_all(n_mics, q, nblk, wav_ref, edge_ref,
                                  bek_ref, bok_ref, w0_ref, w1_ref, x_scr,
                                  ke_scr, ko_scr)
        row0 = q * _QUARTER
        valid = (jax.lax.broadcasted_iota(
            jnp.int32, (_QUARTER, 256), 0) + row0 < n_valid_t).astype(
                jnp.float32)
        ms_q = msp[row0:row0 + _QUARTER]               # (128, 256)
        mn_q = jnp.maximum(1.0 - ms_q, 0.0) * valid
        ms_ny = maskny_ref[0, row0:row0 + _QUARTER]    # (128, 128)
        mn_ny = jnp.maximum(1.0 - ms_ny, 0.0) * valid[:, 0:128]

        def tile(mic, which):
            r0 = mic * _QUARTER
            if which == 0:                             # even bins
                return (ev[r0:r0 + _QUARTER, 0:128],
                        ev[r0:r0 + _QUARTER, 128:256])
            if which == 1:                             # odd bins
                return (od[r0:r0 + _QUARTER, 0:128],
                        od[r0:r0 + _QUARTER, 128:256])
            return ev[r0:r0 + _QUARTER, 256:384], zero_t   # nyquist

        # covariance output lanes stay compact [even|odd|ny] = the 257
        # bins in scrambled order
        for a_i in range(n_mics):
            for b_i in range(a_i, n_mics):
                for which, olo in ((0, 0), (1, 128), (2, 256)):
                    xa_re, xa_im = tile(a_i, which)
                    yb_re, yb_im = tile(b_i, which)
                    if which == 2:  # nyquist tile is real-valued
                        p_re = xa_re * yb_re
                        ms_t, mn_t = ms_ny, mn_ny
                    else:
                        p_re = xa_re * yb_re + xa_im * yb_im
                        ms_t = ms_q[:, olo:olo + 128]
                        mn_t = mn_q[:, olo:olo + 128]
                    rs_re_ref[0, a_i, b_i, olo:olo + 128] += jnp.sum(
                        ms_t * p_re, axis=0)
                    rn_re_ref[0, a_i, b_i, olo:olo + 128] += jnp.sum(
                        mn_t * p_re, axis=0)
                    # imaginary part: identically zero for diagonal
                    # pairs and for the real-valued Nyquist tile — the
                    # zero-initialized output rows already hold it
                    if a_i == b_i or which == 2:
                        continue
                    p_im = xa_im * yb_re - xa_re * yb_im
                    rs_im_ref[0, a_i, b_i, olo:olo + 128] += jnp.sum(
                        ms_t * p_im, axis=0)
                    rn_im_ref[0, a_i, b_i, olo:olo + 128] += jnp.sum(
                        mn_t * p_im, axis=0)
    # mirror the Hermitian lower triangle
    for a_i in range(n_mics):
        for b_i in range(a_i + 1, n_mics):
            rs_re_ref[0, b_i, a_i] = rs_re_ref[0, a_i, b_i]
            rs_im_ref[0, b_i, a_i] = -rs_im_ref[0, a_i, b_i]
            rn_re_ref[0, b_i, a_i] = rn_re_ref[0, a_i, b_i]
            rn_im_ref[0, b_i, a_i] = -rn_im_ref[0, a_i, b_i]


@lru_cache(maxsize=None)
def _perm_matrix():
    """One-hot (256, 256) bf16: natural mask columns (bins 0..255) ->
    scrambled lane order [even | odd] (0/1 is exact in bf16)."""
    perm = lane_permutation()[:_FH]
    p = np.zeros((_FH, _FH), np.float32)
    p[perm, np.arange(_FH)] = 1.0
    return np.asarray(p.astype(jnp.bfloat16))


@partial(jax.jit, static_argnames=("window_key", "n_valid_t", "interpret"))
def stft_covar_pallas(wavb: jax.Array, edges: jax.Array, mask0: jax.Array,
                      mask_ny: jax.Array, window_key: bytes,
                      n_valid_t: int, interpret: bool = False):
    """Fused framing + DIF DFT + masked Rs/Rn pair covariance.

    wavb (B, N, nblk, 256) zero-copy hop blocks; edges (B, N, 2, 256)
    [reflect-head, reflect-tail]; mask0 (B, 512, 256) f32 = mask bins
    0..255 in NATURAL order row-padded to 512 (the kernel permutes to
    lane order internally — both minor-dim pads and lane gathers are
    slow in XLA); mask_ny (B, 512, 128) = the Nyquist-bin mask
    broadcast over lanes.  Returns 4 planes (B, N, N, 768) f32 —
    unnormalized covariance numerators, lanes 0..256 = the 257 bins in
    scrambled [even|odd|ny] order.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    b, n, nblk, hop = wavb.shape
    scale = 1.0 / 32768.0 if wavb.dtype == jnp.int16 else 1.0
    bek, bok, w0, w1 = (jnp.asarray(v)
                        for v in _dif_bases(window_key, scale))
    permp = jnp.asarray(_perm_matrix())

    def const(arr):
        nd = arr.ndim
        return pl.BlockSpec(arr.shape, lambda i: (0,) * nd,
                            memory_space=pltpu.VMEM)

    wav_spec = pl.BlockSpec((1, n, nblk, hop), lambda i: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    edge_spec = pl.BlockSpec((1, n, 2, hop), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM)
    mask_spec = pl.BlockSpec((1, _T_PAD, _FH), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    maskny_spec = pl.BlockSpec((1, _T_PAD, _LANES), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, n, n, _L), lambda i: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((b, n, n, _L), jnp.float32)
    return pl.pallas_call(
        partial(_stft_covar_kernel, n, nblk, n_valid_t),
        grid=(b,),
        in_specs=[wav_spec, edge_spec, mask_spec, maskny_spec,
                  const(permp), const(bek), const(bok), const(w0),
                  const(w1)],
        out_specs=[out_spec] * 4,
        out_shape=[out_shape] * 4,
        scratch_shapes=[
            pltpu.VMEM((_QUARTER + 1, hop), wavb.dtype),
            pltpu.VMEM((n * _QUARTER, 3 * hop), jnp.bfloat16),
            pltpu.VMEM((n * _QUARTER, 3 * hop), jnp.bfloat16),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(wavb, edges, mask0, mask_ny, permp, bek, bok, w0, w1)


def _beamform_istft_kernel(n_mics, nblk, nblk_out, wav_ref, edge_ref,
                           wcat_ref, bek_ref, bok_ref, w0_ref, w1_ref,
                           aek_ref, aok_ref, ws0_ref,
                           ws1_ref, wss_ref, out_ref, x_scr, ke_scr, ko_scr,
                           enh_scr, kie_scr, kio_scr, ola_scr):
    dot = partial(jnp.dot, preferred_element_type=jnp.float32)
    ola_scr[...] = jnp.zeros_like(ola_scr)
    for q in range(_T_PAD // _QUARTER):
        if q * _QUARTER > nblk + 1:
            break  # quarter holds only zero pad blocks (static skip)
        row0 = q * _QUARTER
        ev, od = _dif_quarter_all(n_mics, q, nblk, wav_ref, edge_ref,
                                  bek_ref, bok_ref, w0_ref, w1_ref,
                                  x_scr, ke_scr, ko_scr)
        # enhanced spectrum lanes: [ere|eie|eny-tile|ero|eio]
        enh_scr[...] = jnp.zeros_like(enh_scr)
        for mic in range(n_mics):
            r0 = mic * _QUARTER
            # wcat (1, N, 640): [wr_e|wr_o|wi_e|wi_o|wny-tile]
            wr_e = wcat_ref[0, mic, 0:128]
            wr_o = wcat_ref[0, mic, 128:256]
            wi_e = wcat_ref[0, mic, 256:384]
            wi_o = wcat_ref[0, mic, 384:512]
            wny = wcat_ref[0, mic, 512:640]
            re_e = ev[r0:r0 + _QUARTER, 0:128]
            im_e = ev[r0:r0 + _QUARTER, 128:256]
            ny = ev[r0:r0 + _QUARTER, 256:384]
            re_o = od[r0:r0 + _QUARTER, 0:128]
            im_o = od[r0:r0 + _QUARTER, 128:256]
            # enh = sum_mic conj(w) * obs
            enh_scr[:, 0:128] += wr_e * re_e + wi_e * im_e
            enh_scr[:, 128:256] += wr_e * im_e - wi_e * re_e
            enh_scr[:, 256:384] += wny * ny
            enh_scr[:, 384:512] += wr_o * re_o + wi_o * im_o
            enh_scr[:, 512:640] += wr_o * im_o - wi_o * re_o
        # inverse DIT: ae (128, 256) from [ere|eie|eny], od from [ero|eio]
        _kstack3(enh_scr[:, 0:384], kie_scr, 384)
        _kstack3(enh_scr[:, 384:640], kio_scr, 256)
        ae = dot(kie_scr[...], aek_ref[...])
        od_i = dot(kio_scr[...], aok_ref[...])
        p = (ae + od_i) * ws0_ref[...]       # frame first halves
        qq = (ae - od_i) * ws1_ref[...]      # frame second halves
        # overlap-add at 50%: out[j] = P[j+1] + Q[j]  (row j = frame j)
        ola_scr[row0:row0 + _QUARTER] += qq
        if q == 0:
            ola_scr[0:_QUARTER - 1] += p[1:_QUARTER]
        else:
            ola_scr[row0 - 1:row0 + _QUARTER - 1] += p
    out_ref[0] = ola_scr[0:nblk_out] * wss_ref[...]


@partial(jax.jit, static_argnames=("window_key", "nblk_out", "interpret"))
def beamform_istft_pallas(wavb: jax.Array, edges: jax.Array,
                          wcat: jax.Array, wss_inv: jax.Array,
                          window_key: bytes, nblk_out: int,
                          interpret: bool = False) -> jax.Array:
    """Fused framing + DIF DFT + w^H y beamform + inverse DIT + OLA.

    wavb/edges as in :func:`stft_covar_pallas`; wcat (B, N, 640) f32
    packed beamformer weights [wr_e|wr_o|wi_e|wi_o|wny@lane512];
    wss_inv (nblk_out, 256) f32 reciprocal window-sum-square envelope.
    Returns (B, nblk_out, 256) sample blocks (reshape to (B, samples)).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    b, n, nblk, hop = wavb.shape
    scale = 1.0 / 32768.0 if wavb.dtype == jnp.int16 else 1.0
    bek, bok, w0, w1 = (jnp.asarray(v)
                        for v in _dif_bases(window_key, scale))
    aek, aok, ws0, ws1 = (jnp.asarray(v)
                          for v in _dit_inverse_bases(window_key))

    def const(arr):
        nd = arr.ndim
        return pl.BlockSpec(arr.shape, lambda i: (0,) * nd,
                            memory_space=pltpu.VMEM)

    wav_spec = pl.BlockSpec((1, n, nblk, hop), lambda i: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    edge_spec = pl.BlockSpec((1, n, 2, hop), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM)
    wcat_spec = pl.BlockSpec((1, n, 640), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, nblk_out, hop), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_beamform_istft_kernel, n, nblk, nblk_out),
        grid=(b,),
        in_specs=[wav_spec, edge_spec, wcat_spec, const(bek), const(bok),
                  const(w0), const(w1), const(aek),
                  const(aok), const(ws0), const(ws1), const(wss_inv)],
        out_specs=[out_spec],
        out_shape=[
            jax.ShapeDtypeStruct((b, nblk_out, hop), jnp.float32)
        ],
        scratch_shapes=[
            pltpu.VMEM((_QUARTER + 1, hop), wavb.dtype),
            pltpu.VMEM((n * _QUARTER, 3 * hop), jnp.bfloat16),
            pltpu.VMEM((n * _QUARTER, 3 * hop), jnp.bfloat16),
            pltpu.VMEM((_QUARTER, 640), jnp.float32),
            pltpu.VMEM((_QUARTER, 3 * 384), jnp.bfloat16),
            pltpu.VMEM((_QUARTER, 3 * 256), jnp.bfloat16),
            pltpu.VMEM((_T_PAD, hop), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(wavb, edges, wcat, bek, bok, w0, w1, aek, aok, ws0, ws1,
      wss_inv)[0]


# --------------------------------------------------------------------------
# Online (chunked EMA) variant — the reference's --update-periods mode
# --------------------------------------------------------------------------

def fused_online_supported(cfg, num_mics: int, nsamps: int,
                           out_samps: int, chunk: int) -> bool:
    """The online fused path additionally needs the chunk to tile the
    kernel's 128-frame quarters."""
    return (fused_mvdr_supported(cfg, num_mics, nsamps, out_samps)
            and 8 <= chunk <= _QUARTER and _QUARTER % chunk == 0)


def _ema_matrices(chunk: int, alpha: float):
    """Per-quarter EMA mixing constants.

    e_g = alpha^{g+1} prev + sum_{j<=g} alpha^{g-j} phi_j c_j with
    phi_j = 1 - alpha (except the global first chunk: phi = 1).  W is
    the lower-triangular chunk-mixing matrix; d the prev-decay column.
    """
    g = _QUARTER // chunk
    j = np.arange(g)
    powers = np.where(j[:, None] >= j[None, :],
                      alpha ** (j[:, None] - j[None, :]), 0.0)
    w = powers * (1.0 - alpha)
    w0 = w.copy()
    w0[:, 0] = powers[:, 0]  # global first chunk: phi = 1
    d = (alpha ** (j + 1.0))[:, None]

    def kstack(m):
        # hi/lo K-stack [W_h | W_l | W_h] so the in-kernel EMA mixing
        # dot runs error-compensated: the plain bf16 dot rounded the
        # alpha-power mixing weights themselves and the on-chip online
        # output drifted to ~9e-3 relative vs the XLA path
        hi = m.astype(jnp.bfloat16)
        lo = (m - np.asarray(hi, np.float32)).astype(jnp.bfloat16)
        return np.concatenate([hi, hi, lo], axis=1)

    return kstack(np.asarray(w0, np.float32)), kstack(
        np.asarray(w, np.float32)), np.asarray(d, np.float32)


def _stft_covar_online_kernel(n_mics, nblk, n_valid_t, chunk, alpha,
                              power_iters, wav_ref, edge_ref, mask_ref,
                              maskny_ref, permp_ref, bek_ref, bok_ref,
                              w0_ref, w1_ref, wem0_ref, wem_ref, dem_ref,
                              wcat_ref, x_scr, ke_scr, ko_scr):
    from setk_tpu.ops.pallas.mvdr import mvdr_weights_tiles
    dot = partial(jnp.dot, preferred_element_type=jnp.float32)
    n = n_mics
    g_per_q = _QUARTER // chunk
    w0_c, w_c, d_c = wem0_ref[...], wem_ref[...], dem_ref[...]
    wcat_ref[...] = jnp.zeros_like(wcat_ref)
    ms_nat = mask_ref[0]
    mh = ms_nat.astype(jnp.bfloat16)
    mlo = (ms_nat - mh.astype(jnp.float32)).astype(jnp.bfloat16)
    msp = dot(mh, permp_ref[...]) + dot(mlo, permp_ref[...])
    zero_g = jnp.zeros((g_per_q, _LANES), jnp.float32)
    zero_t = jnp.zeros((_QUARTER, _LANES), jnp.float32)
    # EMA carries: [i][j][sec] -> (1, 128) rows (last chunk's state)
    zrow = jnp.zeros((1, _LANES), jnp.float32)
    prev = {m: [[[zrow] * 3 for _ in range(n)] for _ in range(n)]
            for m in ("sr", "si", "nr", "ni")}

    for q in range(_T_PAD // _QUARTER):
        if q * _QUARTER > nblk + 1:
            break  # quarter holds only zero pad blocks (static skip)
        w_mix = w0_c if q == 0 else w_c
        ev, od = _dif_quarter_all(n_mics, q, nblk, wav_ref, edge_ref,
                                  bek_ref, bok_ref, w0_ref, w1_ref,
                                  x_scr, ke_scr, ko_scr)
        row0 = q * _QUARTER
        valid = (jax.lax.broadcasted_iota(
            jnp.int32, (_QUARTER, 256), 0) + row0 < n_valid_t).astype(
                jnp.float32)
        ms_q = msp[row0:row0 + _QUARTER]
        mn_q = jnp.maximum(1.0 - ms_q, 0.0) * valid
        ms_ny = maskny_ref[0, row0:row0 + _QUARTER]
        mn_ny = jnp.maximum(1.0 - ms_ny, 0.0) * valid[:, 0:128]

        def gsum(x):
            """Per-chunk sums: (128, 128) -> (G, 128)."""
            return jnp.sum(x.reshape(g_per_q, chunk, _LANES), axis=1)

        inv_s = [1.0 / jnp.maximum(gsum(m), 1e-6)
                 for m in (ms_q[:, 0:128], ms_q[:, 128:256], ms_ny)]
        inv_n = [1.0 / jnp.maximum(gsum(m), 1e-6)
                 for m in (mn_q[:, 0:128], mn_q[:, 128:256], mn_ny)]

        def tile(mic, which):
            r0 = mic * _QUARTER
            if which == 0:
                return (ev[r0:r0 + _QUARTER, 0:128],
                        ev[r0:r0 + _QUARTER, 128:256])
            if which == 1:
                return (od[r0:r0 + _QUARTER, 0:128],
                        od[r0:r0 + _QUARTER, 128:256])
            return ev[r0:r0 + _QUARTER, 256:384], zero_t

        # per-chunk normalized covariances, EMA-mixed via one (G, G)
        # dot per entry plane: e = W_mix @ c + d * prev
        rs_re = [[None] * n for _ in range(n)]
        rs_im = [[None] * n for _ in range(n)]
        rn_re = [[None] * n for _ in range(n)]
        rn_im = [[None] * n for _ in range(n)]
        for a_i in range(n):
            for b_i in range(a_i, n):
                acc = {m: [] for m in ("sr", "si", "nr", "ni")}
                for sec, which in ((0, 0), (1, 1), (2, 2)):
                    xa_re, xa_im = tile(a_i, which)
                    yb_re, yb_im = tile(b_i, which)
                    if which == 2:
                        p_re = xa_re * yb_re
                        ms_t, mn_t = ms_ny, mn_ny
                    else:
                        p_re = xa_re * yb_re + xa_im * yb_im
                        olo = 128 * sec
                        ms_t = ms_q[:, olo:olo + 128]
                        mn_t = mn_q[:, olo:olo + 128]
                    cs_re = gsum(ms_t * p_re) * inv_s[sec]
                    cn_re = gsum(mn_t * p_re) * inv_n[sec]
                    if a_i == b_i or which == 2:
                        cs_im = cn_im = zero_g
                    else:
                        p_im = xa_im * yb_re - xa_re * yb_im
                        cs_im = gsum(ms_t * p_im) * inv_s[sec]
                        cn_im = gsum(mn_t * p_im) * inv_n[sec]
                    for m, c in (("sr", cs_re), ("si", cs_im),
                                 ("nr", cn_re), ("ni", cn_im)):
                        c_h = c.astype(jnp.bfloat16)
                        c_l = (c - c_h.astype(jnp.float32)).astype(
                            jnp.bfloat16)
                        c3 = jnp.concatenate([c_h, c_l, c_h], axis=0)
                        e = dot(w_mix, c3) + d_c * prev[m][a_i][b_i][sec]
                        prev[m][a_i][b_i][sec] = e[g_per_q - 1:g_per_q]
                        acc[m].append(e)
                # stack the 3 bin sections along sublanes: (3G, 128)
                rs_re[a_i][b_i] = jnp.concatenate(acc["sr"], axis=0)
                rs_im[a_i][b_i] = jnp.concatenate(acc["si"], axis=0)
                rn_re[a_i][b_i] = jnp.concatenate(acc["nr"], axis=0)
                rn_im[a_i][b_i] = jnp.concatenate(acc["ni"], axis=0)
                if b_i != a_i:
                    rs_re[b_i][a_i] = rs_re[a_i][b_i]
                    rs_im[b_i][a_i] = -rs_im[a_i][b_i]
                    rn_re[b_i][a_i] = rn_re[a_i][b_i]
                    rn_im[b_i][a_i] = -rn_im[a_i][b_i]

        # one lane-parallel MVDR solve covers all G chunks x 3 sections
        w_re, w_im = mvdr_weights_tiles(rs_re, rs_im, rn_re, rn_im, n,
                                        power_iters, 1e-6)
        c0 = q * g_per_q
        for mic in range(n):
            for g in range(g_per_q):
                wcat_ref[0, c0 + g, mic, 0:128] = w_re[mic][g]
                wcat_ref[0, c0 + g, mic, 128:256] = w_re[mic][g_per_q + g]
                wcat_ref[0, c0 + g, mic, 256:384] = w_im[mic][g]
                wcat_ref[0, c0 + g, mic, 384:512] = w_im[mic][g_per_q + g]
                wcat_ref[0, c0 + g, mic, 512:640] = w_re[mic][
                    2 * g_per_q + g]


@partial(jax.jit, static_argnames=("window_key", "n_valid_t", "chunk",
                                   "alpha", "power_iters", "interpret"))
def stft_covar_online_pallas(wavb: jax.Array, edges: jax.Array,
                             mask0: jax.Array, mask_ny: jax.Array,
                             window_key: bytes, n_valid_t: int,
                             chunk: int, alpha: float,
                             power_iters: int = 15,
                             interpret: bool = False):
    """Online fused analysis: framing + DIF DFT + per-chunk masked
    covariances + EMA (reference --update-periods semantics,
    /root/reference/src/apply-supervised-mvdr.cc:196-226) + the
    in-kernel lane-parallel MVDR solve — PER-CHUNK WEIGHTS out.

    Inputs as :func:`stft_covar_pallas`; returns wcat (B, NC, N, 640)
    f32 packed per-chunk weights (NC = 512/chunk rows, pad rows zero)
    in the beamform kernel's [wr_e|wr_o|wi_e|wi_o|wny] layout.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    b, n, nblk, hop = wavb.shape
    scale = 1.0 / 32768.0 if wavb.dtype == jnp.int16 else 1.0
    bek, bok, w0, w1 = (jnp.asarray(v)
                        for v in _dif_bases(window_key, scale))
    permp = jnp.asarray(_perm_matrix())
    wem0, wem, dem = (jnp.asarray(v) for v in _ema_matrices(chunk, alpha))
    nc = _T_PAD // chunk

    def const(arr):
        nd = arr.ndim
        return pl.BlockSpec(arr.shape, lambda i: (0,) * nd,
                            memory_space=pltpu.VMEM)

    wav_spec = pl.BlockSpec((1, n, nblk, hop), lambda i: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    edge_spec = pl.BlockSpec((1, n, 2, hop), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM)
    mask_spec = pl.BlockSpec((1, _T_PAD, _FH), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    maskny_spec = pl.BlockSpec((1, _T_PAD, _LANES), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, nc, n, 640), lambda i: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_stft_covar_online_kernel, n, nblk, n_valid_t, chunk,
                alpha, power_iters),
        grid=(b,),
        in_specs=[wav_spec, edge_spec, mask_spec, maskny_spec,
                  const(permp), const(bek), const(bok), const(w0),
                  const(w1), const(wem0), const(wem), const(dem)],
        out_specs=[out_spec],
        out_shape=[jax.ShapeDtypeStruct((b, nc, n, 640), jnp.float32)],
        scratch_shapes=[
            pltpu.VMEM((_QUARTER + 1, hop), wavb.dtype),
            pltpu.VMEM((n * _QUARTER, 3 * hop), jnp.bfloat16),
            pltpu.VMEM((n * _QUARTER, 3 * hop), jnp.bfloat16),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(wavb, edges, mask0, mask_ny, permp, bek, bok, w0, w1, wem0, wem,
      dem)[0]


def _beamform_istft_online_kernel(n_mics, nblk, nblk_out, chunk, wav_ref,
                                  edge_ref, wcat_ref, bek_ref, bok_ref,
                                  w0_ref, w1_ref, aek_ref, aok_ref,
                                  ws0_ref, ws1_ref, wss_ref, out_ref,
                                  x_scr, ke_scr, ko_scr, enh_scr,
                                  kie_scr, kio_scr, ola_scr):
    dot = partial(jnp.dot, preferred_element_type=jnp.float32)
    g_per_q = _QUARTER // chunk
    ola_scr[...] = jnp.zeros_like(ola_scr)
    for q in range(_T_PAD // _QUARTER):
        if q * _QUARTER > nblk + 1:
            break
        row0 = q * _QUARTER
        c0 = q * g_per_q
        ev, od = _dif_quarter_all(n_mics, q, nblk, wav_ref, edge_ref,
                                  bek_ref, bok_ref, w0_ref, w1_ref,
                                  x_scr, ke_scr, ko_scr)
        enh_scr[...] = jnp.zeros_like(enh_scr)
        for mic in range(n_mics):
            r0 = mic * _QUARTER
            re_e = ev[r0:r0 + _QUARTER, 0:128]
            im_e = ev[r0:r0 + _QUARTER, 128:256]
            ny = ev[r0:r0 + _QUARTER, 256:384]
            re_o = od[r0:r0 + _QUARTER, 0:128]
            im_o = od[r0:r0 + _QUARTER, 128:256]
            # per-chunk weights: each 128-frame quarter applies its
            # G = 128/chunk weight rows to chunk-sized frame groups
            for g in range(g_per_q):
                rs_ = slice(g * chunk, (g + 1) * chunk)
                wr_e = wcat_ref[0, c0 + g, mic, 0:128]
                wr_o = wcat_ref[0, c0 + g, mic, 128:256]
                wi_e = wcat_ref[0, c0 + g, mic, 256:384]
                wi_o = wcat_ref[0, c0 + g, mic, 384:512]
                wny = wcat_ref[0, c0 + g, mic, 512:640]
                enh_scr[rs_, 0:128] += (wr_e * re_e[rs_] +
                                        wi_e * im_e[rs_])
                enh_scr[rs_, 128:256] += (wr_e * im_e[rs_] -
                                          wi_e * re_e[rs_])
                enh_scr[rs_, 256:384] += wny * ny[rs_]
                enh_scr[rs_, 384:512] += (wr_o * re_o[rs_] +
                                          wi_o * im_o[rs_])
                enh_scr[rs_, 512:640] += (wr_o * im_o[rs_] -
                                          wi_o * re_o[rs_])
        _kstack3(enh_scr[:, 0:384], kie_scr, 384)
        _kstack3(enh_scr[:, 384:640], kio_scr, 256)
        ae = dot(kie_scr[...], aek_ref[...])
        od_i = dot(kio_scr[...], aok_ref[...])
        p = (ae + od_i) * ws0_ref[...]
        qq = (ae - od_i) * ws1_ref[...]
        ola_scr[row0:row0 + _QUARTER] += qq
        if q == 0:
            ola_scr[0:_QUARTER - 1] += p[1:_QUARTER]
        else:
            ola_scr[row0 - 1:row0 + _QUARTER - 1] += p
    out_ref[0] = ola_scr[0:nblk_out] * wss_ref[...]


@partial(jax.jit, static_argnames=("window_key", "nblk_out", "chunk",
                                   "interpret"))
def beamform_istft_online_pallas(wavb: jax.Array, edges: jax.Array,
                                 wcat: jax.Array, wss_inv: jax.Array,
                                 window_key: bytes, nblk_out: int,
                                 chunk: int,
                                 interpret: bool = False) -> jax.Array:
    """Online variant of :func:`beamform_istft_pallas`: wcat carries one
    weight row PER CHUNK (B, NC, N, 640) and each chunk's frames are
    beamformed with their own weights before the shared inverse
    DIT + overlap-add."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    b, n, nblk, hop = wavb.shape
    nc = wcat.shape[1]
    scale = 1.0 / 32768.0 if wavb.dtype == jnp.int16 else 1.0
    bek, bok, w0, w1 = (jnp.asarray(v)
                        for v in _dif_bases(window_key, scale))
    aek, aok, ws0, ws1 = (jnp.asarray(v)
                          for v in _dit_inverse_bases(window_key))

    def const(arr):
        nd = arr.ndim
        return pl.BlockSpec(arr.shape, lambda i: (0,) * nd,
                            memory_space=pltpu.VMEM)

    wav_spec = pl.BlockSpec((1, n, nblk, hop), lambda i: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    edge_spec = pl.BlockSpec((1, n, 2, hop), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM)
    wcat_spec = pl.BlockSpec((1, nc, n, 640), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, nblk_out, hop), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_beamform_istft_online_kernel, n, nblk, nblk_out, chunk),
        grid=(b,),
        in_specs=[wav_spec, edge_spec, wcat_spec, const(bek), const(bok),
                  const(w0), const(w1), const(aek), const(aok),
                  const(ws0), const(ws1), const(wss_inv)],
        out_specs=[out_spec],
        out_shape=[
            jax.ShapeDtypeStruct((b, nblk_out, hop), jnp.float32)
        ],
        scratch_shapes=[
            pltpu.VMEM((_QUARTER + 1, hop), wavb.dtype),
            pltpu.VMEM((n * _QUARTER, 3 * hop), jnp.bfloat16),
            pltpu.VMEM((n * _QUARTER, 3 * hop), jnp.bfloat16),
            pltpu.VMEM((_QUARTER, 640), jnp.float32),
            pltpu.VMEM((_QUARTER, 3 * 384), jnp.bfloat16),
            pltpu.VMEM((_QUARTER, 3 * 256), jnp.bfloat16),
            pltpu.VMEM((_T_PAD, hop), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(wavb, edges, wcat, bek, bok, w0, w1, aek, aok, ws0, ws1,
      wss_inv)[0]
