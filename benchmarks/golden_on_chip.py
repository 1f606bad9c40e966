#!/usr/bin/env python
"""Golden-asset parity ON THE REAL CHIP.

Runs the reference's committed doc wavs
(/root/reference/doc/*/asset) through the fused TPU kernel pipelines
(CPU tests exercise interpret mode; this validates the actual Mosaic
lowering on real data), plus fused-vs-XLA cross-checks for the kernels
with no committed golden (EM, online MVDR, the LSTM sequence kernel).

Rows and bars (per-row, ratcheted to measured-minus-margin):

    mvdr.wav       magnitude cosine (measured 0.9654, bar 0.96)
    gevd.wav       magnitude cosine, bar 0.915 (~0.01 under the
                   measured 0.926 plateau): the per-bin eigenvector
                   phase is solver-arbitrary (ours mic-0 anchored, the
                   reference LAPACK-arbitrary, libs/beamformer.py:
                   31-54) and overlap-add smears the rotations across
                   bins, so the wav-domain ceiling is the convention,
                   not the kernel (host XLA scores identically;
                   post-OLA phase alignment measured LOWER, 0.858 —
                   see phase_aligned_spec_cos)
    gevd-ban.wav   magnitude cosine, bar 0.95 (plateau 0.959)
    gevd oracle    pre-OLA spectra vs the reference GevdBeamformer on
                   the same mask, per-bin phase quotiented — the
                   phase-clean parity surface (bar 0.98)
    pmwf-0.wav     magnitude cosine (measured 1.0000, bar 0.995)
    cacgmm fused   mask MAD/corr vs the XLA scan path
    cgmm fused     mask MAD/corr vs the XLA scan path
    wpe fused      Si-SNR vs doc/wpe/asset/wpe_egs.wav (bar 38 dB, the
                   CPU golden floor) AND vs the host XLA WPE path
    wpd fused      magnitude cosine vs doc/wpe/asset/wpd_egs.wav
                   (cascaded-EM chaos bounds this: see KERNELS.md)
    online mvdr    Si-SNR of the fused chunked-EMA path vs the host XLA
                   online path (apply-supervised-mvdr.cc:196-226
                   semantics)
    lstm grads     fwd + d/dxg + d/dWh parity of ops/pallas/lstm_seq
                   vs the XLA scan in the REAL bf16 configuration

Run: python benchmarks/golden_on_chip.py [out.json]
(real TPU, ~15-25 min compile; writes a JSON artifact when a path is
given — the per-round GOLDEN_ONCHIP_r*.json evidence files)
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from setk_tpu.dsp.stft import StftConfig, forward_stft, inverse_stft
from setk_tpu.enhance.cluster import cacgmm_em, cgmm_em
from setk_tpu.enhance.wpe import wpd, wpe
from setk_tpu.io.wave import read_wav
from setk_tpu.parallel.enhance_step import enhance_batch
from setk_tpu.utils.hostdev import on_host

RESULTS = {}

ASSET = "/root/reference/doc"
cfg = StftConfig()

wav = read_wav(f"{ASSET}/adaptive_beamformer/asset/egs.wav")  # (N, S)
n, s0 = wav.shape
# hop-align for the fused path
s = (s0 // cfg.frame_hop) * cfg.frame_hop
wav = wav[:, :s]

# CGMM mask on host (the doc recipe's first step)
with on_host():
    spec = np.asarray(forward_stft(jnp.asarray(wav), cfg))
obs = spec.transpose(2, 0, 1).astype(np.complex64)
with on_host():
    gamma, _ = cgmm_em(obs, 2, num_iters=20)
    mask = np.asarray(gamma)[0].astype(np.float32).T  # (T, F)

wavb = jnp.asarray(wav[None])            # (1, N, S) f32
maskb = jnp.asarray(mask[None])          # (1, T, F)


def mag_cos(out, golden, c=cfg):
    with on_host():
        ma = np.abs(np.asarray(forward_stft(jnp.asarray(out), c)))
        mb = np.abs(np.asarray(forward_stft(jnp.asarray(golden), c)))
    # axis 0 is frames only for mono wavs — a ndim mismatch would
    # silently trim channels against frames
    assert ma.ndim == mb.ndim, (ma.shape, mb.shape)
    t = min(ma.shape[0], mb.shape[0])
    a, b = ma[:t].ravel(), mb[:t].ravel()
    return float(np.inner(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))


def phase_aligned_spec_cos(sa, sb):
    """Complex cosine of two PRE-OLA spectra (T, F) after quotienting
    the per-bin global phase.

    GEVD weights are eigenvectors, defined only up to a unit phase per
    bin; ours are mic-0-anchored (enhance/beamformer.fix_steer_phase)
    while the reference inherits LAPACK's arbitrary per-bin phases
    (/root/reference/scripts/sptk/libs/beamformer.py:31-54).  BEFORE
    overlap-add the two spectra differ by exactly one rotation per bin,
    which this quotients out.  AFTER overlap-add the rotations are
    smeared across neighboring bins by the synthesis/analysis windows,
    so no per-bin rotation of a re-analyzed waveform can undo them —
    measured round 4: the aligned cosine of the OLA'd wavs is LOWER
    (0.858) than the raw magnitude cosine (0.926); that is why the
    asset-wav rows keep the magnitude metric and this one scores the
    pre-OLA spectra against the reference ORACLE on the same mask.
    """
    sa, sb = np.asarray(sa), np.asarray(sb)
    t = min(sa.shape[0], sb.shape[0])
    sa, sb = sa[:t], sb[:t]
    ip = np.sum(sa * np.conj(sb), axis=0)            # (F,)
    rot = np.conj(ip) / np.maximum(np.abs(ip), 1e-12)
    a, b = (sa * rot).ravel(), sb.ravel()
    return float(np.real(np.vdot(b, a)) /
                 (np.linalg.norm(a) * np.linalg.norm(b)))


def si_snr_np(x, ref):
    t = min(len(x), len(ref))
    x, ref = x[:t] - x[:t].mean(), ref[:t] - ref[:t].mean()
    p = np.inner(x, ref) * ref / (np.linalg.norm(ref) ** 2 + 1e-12)
    return float(20 * np.log10(np.linalg.norm(p) /
                               (np.linalg.norm(x - p) + 1e-12)))


# GEVD bars: the eigen-phase convention bounds the asset-wav magnitude
# cosine at ~0.926/0.959 (round-3 decomposition: the host XLA path
# scores the IDENTICAL number, so this is convention, not kernel
# error); the pipeline is deterministic on a fixed input (measured
# r3 0.9266 vs r4 0.9263 across kernel-change rounds), so the bars sit
# ~0.01 under the measured plateau instead of 0.001 (VERDICT r03 #7).
for name, golden_file, bar, kw in (
        ("mvdr", "mvdr.wav", 0.96, {}),
        ("gevd", "gevd.wav", 0.915, {}),
        ("gevd", "gevd-ban.wav", 0.95, {"ban": True}),
        ("pmwf-0", "pmwf-0.wav", 0.995, {})):
    fn = jax.jit(lambda w, m, _n=name, _kw=dict(kw): enhance_batch(
        w, m, cfg, beamformer=_n, **_kw))
    out = np.asarray(fn(wavb, maskb))[0]
    golden = read_wav(f"{ASSET}/adaptive_beamformer/asset/{golden_file}")
    cos = mag_cos(out, golden[:s])
    passed = cos > bar
    print(f"{golden_file:>14}: on-chip magnitude cosine {cos:.4f} "
          f"(bar {bar})  {'OK' if passed else 'LOW'}", flush=True)
    assert np.isfinite(out).all()
    RESULTS[golden_file] = {"magnitude_cosine": round(cos, 4),
                            "bar": bar, "pass": passed}

# --- GEVD vs the reference ORACLE, pre-OLA (the phase-clean surface) --
# Runs the reference's own GevdBeamformer (numpy, float64) on the SAME
# mask/observations and scores our on-chip enhanced SPECTRA against its
# spectra with the per-bin eigen-phase quotiented — the equivalence-
# class comparison the asset wav cannot support (see
# phase_aligned_spec_cos).  Target: libs/beamformer.py:662-682.
sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))), "tests"))
import reference_oracle as ro
from setk_tpu.enhance import beamformer as bf_mod

# planar transfer: complex arrays cannot cross host<->device on axon
mask_fb = jnp.asarray(mask.T[None])                  # (1, F, T)
o_re_g = jnp.asarray(np.real(obs)[None])
o_im_g = jnp.asarray(np.imag(obs)[None])
sr_g, si_g = jax.jit(lambda re, im, m: (lambda e: (
    jnp.real(e), jnp.imag(e)))(
    bf_mod.supervised_run("gevd", jax.lax.complex(re, im), m)))(
        o_re_g, o_im_g, mask_fb)
ours_spec = (np.asarray(sr_g) + 1j * np.asarray(si_g))[0]   # (F, T)
ref_cls = ro.ref_beamformer.GevdBeamformer(cfg.num_bins)
# reference run(): mask_s (T, F), obs (N, F, T) -> (F, T) (the run()
# docstring says N x T x F but compute_covar_mat:244-260 wants N, F, T)
ref_spec = ref_cls.run(mask, obs.transpose(1, 0, 2))
cos_o = phase_aligned_spec_cos(ours_spec.T, np.asarray(ref_spec).T)
ok_o = cos_o > 0.98
print(f"gevd vs oracle: pre-OLA phase-aligned cosine {cos_o:.4f} "
      f"(bar 0.98)  {'OK' if ok_o else 'LOW'}", flush=True)
RESULTS["gevd_oracle_spectra"] = {"phase_aligned_cosine": round(cos_o, 4),
                                  "bar": 0.98, "pass": ok_o}

# --- fused EM (CACGMM and CGMM) ON the chip vs the host XLA path -------
# (the in-kernel Jacobi EM's Mosaic lowering on real audio; CPU tests
# only see interpret mode)
obs_planar = (jnp.asarray(np.real(obs)), jnp.asarray(np.imag(obs)))
for mdl, em in (("cacgmm", cacgmm_em), ("cgmm", cgmm_em)):
    with on_host():
        g_host, q_host = em(jnp.asarray(obs), 2, num_iters=20,
                            use_fused=False)
        g_host, q_host = np.asarray(g_host), np.asarray(q_host)
    fn_em = jax.jit(lambda re, im, _em=em: _em(
        jax.lax.complex(re, im), 2, num_iters=20, use_fused=True))
    g_chip, q_chip = fn_em(*obs_planar)
    g_chip, q_chip = np.asarray(g_chip), np.asarray(q_chip)
    mad = float(np.mean(np.abs(g_chip - g_host)))
    corr = float(np.corrcoef(g_chip.ravel(), g_host.ravel())[0, 1])
    dq = float(np.max(np.abs(q_chip - q_host)))
    em_ok = mad < 0.02 and corr > 0.99 and dq < 0.05
    print(f"{mdl} fused-vs-xla: mask MAD {mad:.5f} corr {corr:.5f} "
          f"max|dQ| {dq:.4f}  {'OK' if em_ok else 'LOW'}", flush=True)
    RESULTS[f"{mdl}_fused"] = {"mask_mad": round(mad, 5),
                               "mask_corr": round(corr, 5),
                               "max_q_diff": round(dq, 4), "pass": em_ok}

# --- fused online (chunked-EMA) MVDR vs the host XLA online path -------
fn_on = jax.jit(lambda w, m: enhance_batch(w, m, cfg, chunk_size=32))
out_on = np.asarray(fn_on(wavb, maskb))[0]
with on_host():
    ref_on = np.asarray(enhance_batch(jnp.asarray(wav[None]),
                                      jnp.asarray(mask[None]), cfg,
                                      chunk_size=32))[0]
si_on = si_snr_np(out_on, ref_on)
on_ok = bool(si_on > 40.0 and np.isfinite(out_on).all())
print(f"online mvdr fused-vs-xla: Si-SNR {si_on:.1f} dB (bar 40)  "
      f"{'OK' if on_ok else 'LOW'}", flush=True)
RESULTS["online_mvdr_fused"] = {"si_snr_vs_xla_db": round(si_on, 1),
                                "bar_db": 40.0, "pass": on_ok}

# --- fused WPE vs the committed golden AND the host XLA path -----------
cfg_w = StftConfig(frame_len=512, frame_hop=128)
wav_w = read_wav(f"{ASSET}/wpe/asset/egs.wav")
golden_w = read_wav(f"{ASSET}/wpe/asset/wpe_egs.wav")
with on_host():
    spec_w = np.asarray(forward_stft(jnp.asarray(wav_w), cfg_w))
obs_w = spec_w.transpose(2, 0, 1).astype(np.complex64)  # (F, N, T)
fn_wpe = jax.jit(lambda re, im: (lambda d: (jnp.real(d), jnp.imag(d)))(
    wpe(jax.lax.complex(re, im), taps=10, delay=3, context=1,
        num_iters=3, use_fused=True)))
dr, di = fn_wpe(jnp.asarray(np.real(obs_w)), jnp.asarray(np.imag(obs_w)))
der = np.asarray(dr) + 1j * np.asarray(di)
with on_host():
    out_w = np.asarray(inverse_stft(
        jnp.asarray(der.transpose(1, 2, 0)), cfg_w,
        nsamps=wav_w.shape[-1]))
    der_x = np.asarray(wpe(jnp.asarray(obs_w), taps=10, delay=3,
                           context=1, num_iters=3, use_fused=False))
    out_x = np.asarray(inverse_stft(
        jnp.asarray(der_x.transpose(1, 2, 0)), cfg_w,
        nsamps=wav_w.shape[-1]))
si_wg = si_snr_np(out_w[0], golden_w[0])
si_wx = si_snr_np(out_w[0], out_x[0])
wpe_ok = si_wg > 38.0 and si_wx > 40.0
print(f"wpe fused: Si-SNR vs golden {si_wg:.1f} dB (bar 38), "
      f"vs host XLA {si_wx:.1f} dB (bar 40)  "
      f"{'OK' if wpe_ok else 'LOW'}", flush=True)
RESULTS["wpe_fused"] = {"si_snr_vs_golden_db": round(si_wg, 1),
                        "si_snr_vs_xla_db": round(si_wx, 1),
                        "pass": wpe_ok}

# --- fused WPD vs the committed golden ---------------------------------
# (doc recipe: apply_wpd.py --frame-len 512 --taps 10 --delay 3
#  --context 1 --wpd-iters 2 --cgmm-iters 10; cascaded-EM arithmetic
#  chaos bounds waveform agreement — magnitude cosine is the surface,
#  see doc/KERNELS.md "Round-3 findings")
golden_d = read_wav(f"{ASSET}/wpe/asset/wpd_egs.wav")
with on_host():
    spec_d = np.asarray(forward_stft(jnp.asarray(wav_w), cfg))
obs_d = spec_d.transpose(2, 0, 1).astype(np.complex64)
fn_wpd = jax.jit(lambda re, im: (lambda me: (jnp.real(me[1]),
                                             jnp.imag(me[1])))(
    wpd(jax.lax.complex(re, im), cgmm_iters=10, wpd_iters=2, taps=10,
        delay=3, context=1, use_fused=True)))
er, ei = fn_wpd(jnp.asarray(np.real(obs_d)), jnp.asarray(np.imag(obs_d)))
enh_d = np.asarray(er) + 1j * np.asarray(ei)          # (F, T)
with on_host():
    out_d = np.asarray(inverse_stft(jnp.asarray(enh_d.T), cfg,
                                    nsamps=wav_w.shape[-1]))
cos_d = mag_cos(out_d, golden_d)
wpd_ok = bool(cos_d > 0.90 and np.isfinite(out_d).all())
print(f"wpd fused: magnitude cosine vs golden {cos_d:.4f} (bar 0.90)  "
      f"{'OK' if wpd_ok else 'LOW'}", flush=True)
RESULTS["wpd_fused"] = {"magnitude_cosine": round(cos_d, 4),
                        "bar": 0.90, "pass": wpd_ok}

# --- fused WPE chirp-conditioning robustness (chip-only failure
#     class: bf16 gram error under near-singular tonal solves; the
#     2-term-split gram NaN'd here at 1e-6 loading) ---------------------
sr_c = 16000
tt_c = np.arange(4 * sr_c) / sr_c
rng_c = np.random.default_rng(0)
chirp = np.sin(2 * np.pi * (300 + 600 * tt_c) * tt_c).astype(
    np.float32) * 0.5
mix_c = chirp[None] + rng_c.standard_normal((6, 4 * sr_c)).astype(
    np.float32) * 0.25
with on_host():
    spec_c = np.asarray(forward_stft(jnp.asarray(mix_c), cfg))
obs_c = spec_c.transpose(2, 0, 1).astype(np.complex64)
fn_c = jax.jit(lambda re, im: (lambda d: (jnp.real(d), jnp.imag(d)))(
    wpe(jax.lax.complex(re, im), taps=10, delay=3, context=1,
        num_iters=3, use_fused=True)))
cr_, ci_ = fn_c(jnp.asarray(obs_c.real), jnp.asarray(obs_c.imag))
der_c = np.asarray(cr_) + 1j * np.asarray(ci_)
with on_host():
    der_cx = np.asarray(wpe(jnp.asarray(obs_c), taps=10, delay=3,
                            context=1, num_iters=3, use_fused=False))
rel_c = float(np.abs(der_c - der_cx).max() / np.abs(der_cx).max())
chirp_ok = bool(np.isfinite(der_c).all() and rel_c < 0.05)
print(f"wpe fused chirp torture: finite {bool(np.isfinite(der_c).all())}"
      f", vs host XLA max rel {rel_c:.2e} (bar 0.05)  "
      f"{'OK' if chirp_ok else 'LOW'}", flush=True)
RESULTS["wpe_fused_chirp"] = {"max_rel_vs_xla": round(rel_c, 6),
                              "finite": bool(np.isfinite(der_c).all()),
                              "pass": chirp_ok}

# --- LSTM sequence kernel: fwd + gradient parity in the real bf16
#     configuration (CPU tests only check interpret mode at f32) -------
from setk_tpu.models.mask_net import _lstm_gates, _rec_matmul  # noqa: E402
from setk_tpu.ops.pallas.lstm_seq import lstm_seq_bidir  # noqa: E402

T_, B_, H_ = 96, 64, 512
rng = np.random.default_rng(0)
# pre-round the gate pre-activations to bf16 values so both paths see
# IDENTICAL inputs (the kernel path feeds bf16 projections)
xgf = jnp.asarray(rng.standard_normal((T_, B_, 4 * H_)) * 0.25,
                  jnp.bfloat16).astype(jnp.float32)
xgb = jnp.asarray(rng.standard_normal((T_, B_, 4 * H_)) * 0.25,
                  jnp.bfloat16).astype(jnp.float32)
whf = jnp.asarray(rng.standard_normal((H_, 4 * H_)) * 0.05, jnp.float32)
whb = jnp.asarray(rng.standard_normal((H_, 4 * H_)) * 0.05, jnp.float32)
r1 = jnp.asarray(rng.standard_normal((T_, B_, H_)) * 0.1, jnp.float32)
r2 = jnp.asarray(rng.standard_normal((T_, B_, H_)) * 0.1, jnp.float32)


def loss_kernel(xf, xb, wf, wb):
    yf, yb = lstm_seq_bidir(xf.astype(jnp.bfloat16),
                            xb.astype(jnp.bfloat16),
                            wf.astype(jnp.bfloat16),
                            wb.astype(jnp.bfloat16))
    return jnp.sum(yf.astype(jnp.float32) * r1 +
                   yb.astype(jnp.float32) * r2)


def loss_scan(xf, xb, wf, wb):
    h0 = jnp.zeros((B_, H_), jnp.float32)

    def step(carry, xs):
        hf, cf, hb, cb = carry
        xf_t, xb_t = xs
        hf, cf = _lstm_gates(xf_t + _rec_matmul(hf, wf), cf)
        hb, cb = _lstm_gates(xb_t + _rec_matmul(hb, wb), cb)
        return (hf, cf, hb, cb), (hf, hb)

    _, (yf, yb) = jax.lax.scan(step, (h0, h0, h0, h0),
                               (xf, jnp.flip(xb, 0)))
    return jnp.sum(yf * r1 + jnp.flip(yb, 0) * r2)


vg_k = jax.jit(jax.value_and_grad(loss_kernel, argnums=(0, 1, 2, 3)))
vg_s = jax.jit(jax.value_and_grad(loss_scan, argnums=(0, 1, 2, 3)))
vk, gk = vg_k(xgf, xgb, whf, whb)
vs_, gs = vg_s(xgf, xgb, whf, whb)
rel_v = float(abs(vk - vs_) / (abs(vs_) + 1e-12))
coss, rels = [], []
for a, b in zip(gk, gs):
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    coss.append(float(np.inner(a, b) /
                      (np.linalg.norm(a) * np.linalg.norm(b) + 1e-30)))
    rels.append(float(np.linalg.norm(a - b) /
                      (np.linalg.norm(b) + 1e-30)))
lstm_ok = rel_v < 2e-2 and min(coss) > 0.995
print(f"lstm_seq bf16 fused-vs-scan: loss rel {rel_v:.2e}, grad "
      f"cosines {['%.5f' % c for c in coss]}, grad rel-l2 "
      f"{['%.3e' % r for r in rels]}  "
      f"{'OK' if lstm_ok else 'LOW'}", flush=True)
RESULTS["lstm_seq_grads"] = {
    "loss_rel": round(rel_v, 6),
    "grad_cosines": [round(c, 5) for c in coss],
    "grad_rel_l2": [round(r, 5) for r in rels],
    "pass": lstm_ok}

if len(sys.argv) > 1:
    with open(sys.argv[1], "w") as f:
        json.dump({"results": RESULTS,
                   "all_pass": all(bool(r["pass"])
                                   for r in RESULTS.values())},
                  f, indent=1, default=lambda o: o.item())
    print(f"wrote {sys.argv[1]}", flush=True)
print("GOLDEN-ON-CHIP DONE")
