#!/usr/bin/env python
"""Golden-asset parity ON THE REAL CHIP.

Runs the reference's committed doc wavs
(/root/reference/doc/adaptive_beamformer/asset) through the fused TPU
kernel pipelines (CPU tests exercise interpret mode; this validates the
actual Mosaic lowering on real data).  Measured 2026-08-19:

    mvdr.wav      magnitude cosine 0.9654
    gevd.wav      magnitude cosine 0.9266   (phase-anchored GEV vs the
                                             golden's scipy phases)
    gevd-ban.wav  magnitude cosine 0.9592
    pmwf-0.wav    magnitude cosine 1.0000

Run: python benchmarks/golden_on_chip.py [out.json]
(real TPU, ~10 min compile; writes a JSON artifact when a path is given
— the per-round GOLDEN_ONCHIP_r*.json evidence files)
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from setk_tpu.dsp.stft import StftConfig, forward_stft
from setk_tpu.enhance.cluster import cacgmm_em, cgmm_em
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


def mag_cos(out, golden):
    with on_host():
        ma = np.abs(np.asarray(forward_stft(jnp.asarray(out), cfg)))
        mb = np.abs(np.asarray(forward_stft(jnp.asarray(golden[:s]), cfg)))
    t = min(ma.shape[0], mb.shape[0])
    a, b = ma[:t].ravel(), mb[:t].ravel()
    return float(np.inner(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))


for name, golden_file, kw in (("mvdr", "mvdr.wav", {}),
                              ("gevd", "gevd.wav", {}),
                              ("gevd", "gevd-ban.wav", {"ban": True}),
                              ("pmwf-0", "pmwf-0.wav", {})):
    fn = jax.jit(lambda w, m, _n=name, _kw=dict(kw): enhance_batch(
        w, m, cfg, beamformer=_n, **_kw))
    out = np.asarray(fn(wavb, maskb))[0]
    golden = read_wav(f"{ASSET}/adaptive_beamformer/asset/{golden_file}")
    cos = mag_cos(out, golden)
    status = "OK" if cos > 0.92 else "LOW"
    print(f"{golden_file:>14}: on-chip magnitude cosine {cos:.4f}  {status}",
          flush=True)
    assert np.isfinite(out).all()
    RESULTS[golden_file] = {"magnitude_cosine": round(cos, 4),
                            "pass": cos > 0.92}

# --- fused CACGMM ON the chip vs the host XLA path on the same data ----
# (the in-kernel Jacobi EM's Mosaic lowering on real audio; CPU tests
# only see interpret mode)
with on_host():
    g_host, q_host = cacgmm_em(jnp.asarray(obs), 2, num_iters=20,
                               use_fused=False)
    g_host, q_host = np.asarray(g_host), np.asarray(q_host)
obs_planar = (jnp.asarray(np.real(obs)), jnp.asarray(np.imag(obs)))
fn_em = jax.jit(lambda re, im: cacgmm_em(
    jax.lax.complex(re, im), 2, num_iters=20, use_fused=True))
g_chip, q_chip = fn_em(*obs_planar)
g_chip, q_chip = np.asarray(g_chip), np.asarray(q_chip)
mad = float(np.mean(np.abs(g_chip - g_host)))
corr = float(np.corrcoef(g_chip.ravel(), g_host.ravel())[0, 1])
dq = float(np.max(np.abs(q_chip - q_host)))
em_ok = mad < 0.02 and corr > 0.99 and dq < 0.05
print(f"cacgmm fused-vs-xla: mask MAD {mad:.5f} corr {corr:.5f} "
      f"max|dQ| {dq:.4f}  {'OK' if em_ok else 'LOW'}", flush=True)
RESULTS["cacgmm_fused"] = {"mask_mad": round(mad, 5),
                           "mask_corr": round(corr, 5),
                           "max_q_diff": round(dq, 4), "pass": em_ok}

if len(sys.argv) > 1:
    with open(sys.argv[1], "w") as f:
        json.dump({"results": RESULTS,
                   "all_pass": all(r["pass"] for r in RESULTS.values())},
                  f, indent=1)
    print(f"wrote {sys.argv[1]}", flush=True)
print("GOLDEN-ON-CHIP DONE")
