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
    a = w0*x0 + w1*x1                 (real, 256)
    b = (w0*x0 - w1*x1) * tw,         tw[n] = exp(-i*pi*n/256)
with DFT512(y)[2k] = DFT256(a)[k] and DFT512(y)[2k+1] = DFT256(b)[k] —
40% fewer matmul MACs than the direct folded-basis DFT, with the
butterflies as cheap VPU elementwise ops.  Bins stay in *scrambled*
(even|odd) order through the whole pipeline: covariance, solve and
beamforming are bin-order-agnostic, and the inverse kernel's DIT basis
is built in the same order, so nothing ever unscrambles.  Each 3-pass
product (the bf16 hi/lo error compensation XLA's "high" precision uses)
is laid out as ONE K-stacked matmul so the MXU accumulates the passes
internally.

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
            and out_samps == (t - 1) * _HOP)


def lane_permutation():
    """bin-by-lane order for lanes 0..256: [0,2,..,254, 1,3,..,255, 256]."""
    return np.concatenate(
        [np.arange(0, _FH, 2), np.arange(1, _FH, 2), [_FH]])


def _split_hi_lo(x64):
    hi = np.asarray(x64, np.float32).astype(jnp.bfloat16)
    lo = (np.asarray(x64, np.float32) -
          np.asarray(hi, np.float32)).astype(jnp.bfloat16)
    return np.asarray(hi), np.asarray(lo)


@lru_cache(maxsize=None)
def _dif_bases(window_key):
    """Forward DIF bases + window/twiddle vectors (host constants).

    BeK (768, 384) bf16: 3-pass K-stack [hi; lo; hi] for the real
    input a; columns [re_e 128 | im_e 128 | ny 1 + 127 zeros].
    BoK (1536, 256) bf16: inputs [br|bi] K-stacked per pass; columns
    [re_o 128 | im_o 128].
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
    # odd bins, complex input b = br + i*bi against exp(-i ang):
    #   re = br@cos + bi@sin = br@cosb - bi@msinb
    #   im = bi@cos - br@sin = br@msinb + bi@cosb
    bo = np.block([[cosb, msinb], [-msinb, cosb]])
    bo_h, bo_l = _split_hi_lo(bo)
    bok = np.concatenate([bo_h, bo_l, bo_h], axis=0)
    w0 = np.asarray(window[:_HOP], np.float32)
    w1 = np.asarray(window[_HOP:], np.float32)
    twr = np.asarray(np.cos(np.pi * n / m), np.float32)
    twi = np.asarray(-np.sin(np.pi * n / m), np.float32)
    return (np.asarray(bek), np.asarray(bok), w0, w1, twr, twi)


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
            (_QUARTER + 1 - zpos, _HOP), jnp.float32)


def _dif_quarter(x_scr, bek_ref, bok_ref, w0_ref, w1_ref, twr_ref, twi_ref,
                 ke_scr, ko_scr):
    """Windowed radix-2 DIF DFT of one quarter's 128 frames.

    Returns (ev (128, 384): [re_e|im_e|ny+z], od (128, 256):
    [re_o|im_o])."""
    dot = partial(jnp.dot, preferred_element_type=jnp.float32)
    y0 = x_scr[:_QUARTER] * w0_ref[...]
    y1 = x_scr[1:_QUARTER + 1] * w1_ref[...]
    a = y0 + y1
    d = y0 - y1
    br = d * twr_ref[...]
    bi = d * twi_ref[...]
    _kstack3(a, ke_scr, _HOP)
    # odd K-stack interleaves (br, bi) per pass: [br_h|bi_h|br_l|bi_l|..]
    brh = br.astype(jnp.bfloat16)
    brl = (br - brh.astype(jnp.float32)).astype(jnp.bfloat16)
    bih = bi.astype(jnp.bfloat16)
    bil = (bi - bih.astype(jnp.float32)).astype(jnp.bfloat16)
    ko_scr[:, 0 * _HOP:1 * _HOP] = brh
    ko_scr[:, 1 * _HOP:2 * _HOP] = bih
    ko_scr[:, 2 * _HOP:3 * _HOP] = brh
    ko_scr[:, 3 * _HOP:4 * _HOP] = bih
    ko_scr[:, 4 * _HOP:5 * _HOP] = brl
    ko_scr[:, 5 * _HOP:6 * _HOP] = bil
    ev = dot(ke_scr[...], bek_ref[...])
    od = dot(ko_scr[...], bok_ref[...])
    return ev, od


def _stft_covar_kernel(n_mics, nblk, n_valid_t, wav_ref, edge_ref, mask_ref,
                       bek_ref, bok_ref, w0_ref, w1_ref, twr_ref, twi_ref,
                       rs_re_ref, rs_im_ref, rn_re_ref, rn_im_ref, x_scr,
                       ke_scr, ko_scr, spec_scr):
    outs = (rs_re_ref, rs_im_ref, rn_re_ref, rn_im_ref)
    for o in outs:
        o[...] = jnp.zeros_like(o)
    for q in range(_T_PAD // _QUARTER):
        for mic in range(n_mics):
            _assemble_quarter(q, nblk, wav_ref, edge_ref, mic, x_scr)
            ev, od = _dif_quarter(x_scr, bek_ref, bok_ref, w0_ref, w1_ref,
                                  twr_ref, twi_ref, ke_scr, ko_scr)
            # spec lanes [re_e|im_e|ny|re_o|im_o|z]; covariance pairs
            # walk (re, im) tile pairs (0,1), (3,4), (2,5=zero tile)
            spec_scr[mic, :, 0:128] = ev[:, 0:128]
            spec_scr[mic, :, 128:256] = ev[:, 128:256]
            spec_scr[mic, :, 256:384] = ev[:, 256:384]
            spec_scr[mic, :, 384:512] = od[:, 0:128]
            spec_scr[mic, :, 512:640] = od[:, 128:256]
            if q == 0:
                spec_scr[mic, :, 640:768] = jnp.zeros((_QUARTER, 128),
                                                      jnp.float32)
        row0 = q * _QUARTER
        ms_q = mask_ref[0, row0:row0 + _QUARTER]         # (128, 384)
        valid = (jax.lax.broadcasted_iota(
            jnp.int32, (_QUARTER, 384), 0) + row0 < n_valid_t).astype(
                jnp.float32)
        mn_q = (1.0 - ms_q) * valid
        # (re lane tile, im lane tile, mask col tile, out lane tile):
        # covar output lanes stay compact [re_e|re_o|ny...] = bins 0..256
        tiles = ((0, 128, 0, 0), (384, 512, 128, 128), (256, 640, 256, 256))
        for a_i in range(n_mics):
            for b_i in range(a_i, n_mics):
                for (rlo, ilo, mlo, olo) in tiles:
                    xa_re = spec_scr[a_i, :, rlo:rlo + 128]
                    xa_im = spec_scr[a_i, :, ilo:ilo + 128]
                    yb_re = spec_scr[b_i, :, rlo:rlo + 128]
                    yb_im = spec_scr[b_i, :, ilo:ilo + 128]
                    p_re = xa_re * yb_re + xa_im * yb_im
                    p_im = xa_im * yb_re - xa_re * yb_im
                    ms_t = ms_q[:, mlo:mlo + 128]
                    mn_t = mn_q[:, mlo:mlo + 128]
                    rs_re_ref[0, a_i, b_i, olo:olo + 128] += jnp.sum(
                        ms_t * p_re, axis=0)
                    rs_im_ref[0, a_i, b_i, olo:olo + 128] += jnp.sum(
                        ms_t * p_im, axis=0)
                    rn_re_ref[0, a_i, b_i, olo:olo + 128] += jnp.sum(
                        mn_t * p_re, axis=0)
                    rn_im_ref[0, a_i, b_i, olo:olo + 128] += jnp.sum(
                        mn_t * p_im, axis=0)
    # mirror the Hermitian lower triangle
    for a_i in range(n_mics):
        for b_i in range(a_i + 1, n_mics):
            rs_re_ref[0, b_i, a_i] = rs_re_ref[0, a_i, b_i]
            rs_im_ref[0, b_i, a_i] = -rs_im_ref[0, a_i, b_i]
            rn_re_ref[0, b_i, a_i] = rn_re_ref[0, a_i, b_i]
            rn_im_ref[0, b_i, a_i] = -rn_im_ref[0, a_i, b_i]


@partial(jax.jit, static_argnames=("window_key", "n_valid_t", "interpret"))
def stft_covar_pallas(wavb: jax.Array, edges: jax.Array,
                      mask_lanes: jax.Array, window_key: bytes,
                      n_valid_t: int, interpret: bool = False):
    """Fused framing + DIF DFT + masked Rs/Rn pair covariance.

    wavb (B, N, nblk, 256) zero-copy hop blocks; edges (B, N, 2, 256)
    [reflect-head, reflect-tail]; mask_lanes (B, 512, 384) f32 in
    scrambled lane order (cols 0..256 = bins, zero rows >= n_valid_t).
    Returns 4 planes (B, N, N, 768) f32 — unnormalized covariance
    numerators, lanes 0..256 = the 257 bins in scrambled order.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    b, n, nblk, hop = wavb.shape
    bek, bok, w0, w1, twr, twi = (jnp.asarray(v)
                                  for v in _dif_bases(window_key))

    def const(arr):
        nd = arr.ndim
        return pl.BlockSpec(arr.shape, lambda i: (0,) * nd,
                            memory_space=pltpu.VMEM)

    wav_spec = pl.BlockSpec((1, n, nblk, hop), lambda i: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    edge_spec = pl.BlockSpec((1, n, 2, hop), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM)
    mask_spec = pl.BlockSpec((1, _T_PAD, 384), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, n, n, _L), lambda i: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((b, n, n, _L), jnp.float32)
    return pl.pallas_call(
        partial(_stft_covar_kernel, n, nblk, n_valid_t),
        grid=(b,),
        in_specs=[wav_spec, edge_spec, mask_spec, const(bek), const(bok),
                  const(w0), const(w1), const(twr), const(twi)],
        out_specs=[out_spec] * 4,
        out_shape=[out_shape] * 4,
        scratch_shapes=[
            pltpu.VMEM((_QUARTER + 1, hop), jnp.float32),
            pltpu.VMEM((_QUARTER, 3 * hop), jnp.bfloat16),
            pltpu.VMEM((_QUARTER, 6 * hop), jnp.bfloat16),
            pltpu.VMEM((n, _QUARTER, _L), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(wavb, edges, mask_lanes, bek, bok, w0, w1, twr, twi)


def _beamform_istft_kernel(n_mics, nblk, nblk_out, wav_ref, edge_ref,
                           wcat_ref, bek_ref, bok_ref, w0_ref, w1_ref,
                           twr_ref, twi_ref, aek_ref, aok_ref, ws0_ref,
                           ws1_ref, wss_ref, out_ref, x_scr, ke_scr, ko_scr,
                           enh_scr, kie_scr, kio_scr, ola_scr):
    dot = partial(jnp.dot, preferred_element_type=jnp.float32)
    ola_scr[...] = jnp.zeros_like(ola_scr)
    for q in range(_T_PAD // _QUARTER):
        row0 = q * _QUARTER
        # enhanced spectrum lanes: [ere|eie|eny-tile|ero|eio]
        enh_scr[...] = jnp.zeros_like(enh_scr)
        for mic in range(n_mics):
            _assemble_quarter(q, nblk, wav_ref, edge_ref, mic, x_scr)
            ev, od = _dif_quarter(x_scr, bek_ref, bok_ref, w0_ref, w1_ref,
                                  twr_ref, twi_ref, ke_scr, ko_scr)
            # wcat (1, N, 640): [wr_e|wr_o|wi_e|wi_o|wny-tile]
            wr_e = wcat_ref[0, mic, 0:128]
            wr_o = wcat_ref[0, mic, 128:256]
            wi_e = wcat_ref[0, mic, 256:384]
            wi_o = wcat_ref[0, mic, 384:512]
            wny = wcat_ref[0, mic, 512:640]
            re_e, im_e = ev[:, 0:128], ev[:, 128:256]
            ny = ev[:, 256:384]
            re_o, im_o = od[:, 0:128], od[:, 128:256]
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
    bek, bok, w0, w1, twr, twi = (jnp.asarray(v)
                                  for v in _dif_bases(window_key))
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
                  const(w0), const(w1), const(twr), const(twi), const(aek),
                  const(aok), const(ws0), const(ws1), const(wss_inv)],
        out_specs=[out_spec],
        out_shape=[
            jax.ShapeDtypeStruct((b, nblk_out, hop), jnp.float32)
        ],
        scratch_shapes=[
            pltpu.VMEM((_QUARTER + 1, hop), jnp.float32),
            pltpu.VMEM((_QUARTER, 3 * hop), jnp.bfloat16),
            pltpu.VMEM((_QUARTER, 6 * hop), jnp.bfloat16),
            pltpu.VMEM((_QUARTER, 640), jnp.float32),
            pltpu.VMEM((_QUARTER, 3 * 384), jnp.bfloat16),
            pltpu.VMEM((_QUARTER, 3 * 256), jnp.bfloat16),
            pltpu.VMEM((_T_PAD, hop), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(wavb, edges, wcat, bek, bok, w0, w1, twr, twi, aek, aok, ws0, ws1,
      wss_inv)[0]
