#!/usr/bin/env python
"""End-to-end CASCADE benchmarks + reference parity (BASELINE.json
configs 4-5).

Every other bench row measures one stage in isolation; these two run
the graded multi-stage pipelines as ONE jitted TPU program each, on the
same simulated 6-ch linear-array mixture, and score the TPU output
against the reference CPU pipeline built from the reference's own
numpy modules (tests/reference_oracle.py):

  * cascade A — unsupervised CACGMM (20 EM iters, cgmm-init) -> speech
    mask -> mask-based MVDR -> iSTFT
    (reference flow: scripts/run_cacgmm.sh -> estimate_cacgmm_masks.py
    -> apply_adaptive_beamformer.py;
    /root/reference/scripts/sptk/libs/cluster.py:468-535 +
    libs/beamformer.py:515-539)
  * cascade B — WPE dereverberation (3 iters, 10 taps) -> SRP-PHAT DoA
    over a 181-point linear grid -> superdirective beamformer at the
    located DoA -> iSTFT
    (reference flow: apply_wpe.py -> do_ssl.py srp ->
    apply_classic_beamformer.py sd;
    /root/reference/scripts/sptk/libs/wpe.py:80-110 + libs/ssl.py:46-77
    + libs/beamformer.py:430-460)

Parity is scored as Si-SDR of the TPU waveform against the reference
CPU pipeline's waveform per utterance (scale-invariant — GEV/EM class
scaling is arbitrary), plus the located DoA indices for cascade B.

Run: python benchmarks/bench_cascades.py [out.json]   (real TPU;
~10 min with compiles + the per-utterance reference CPU pipelines).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import jax
import jax.numpy as jnp
import numpy as np

from _timing import probe_overhead_ms, timed_scan
from setk_tpu.dsp.stft import StftConfig, forward_stft, inverse_stft
from setk_tpu.enhance import beamformer as bf
from setk_tpu.enhance.cluster import cacgmm_em
from setk_tpu.enhance.wpe import wpe
from setk_tpu.metrics.sisnr import si_snr
from setk_tpu.parallel.enhance_step import enhance_batch
from setk_tpu.spatial.ssl import srp_ssl
from setk_tpu.spatial.steer import (diffuse_covar, linear_distance_matrix,
                                    linear_steer_vector)
from setk_tpu.utils.hostdev import on_host

cfg = StftConfig()
SR = 16000
TOPO = np.array([0.0, 0.05, 0.10, 0.15, 0.20, 0.25])
N_MICS = 6
DOAS = np.linspace(0, 180, 181)
ROWS = {}


def simulate(b, secs, seed=0, doa_deg=60.0):
    """Far-field plane-wave speech from ``doa_deg`` + a point noise from
    120 deg + sensor noise, on the 6-mic linear array (fractional
    delays via rfft phase shifts)."""
    rng = np.random.default_rng(seed)
    s = secs * SR
    tt = np.arange(s) / SR

    def place(sig, deg):
        tau = np.cos(deg * np.pi / 180.0) * TOPO / 340.0
        spec = np.fft.rfft(sig, axis=-1)
        freq = np.fft.rfftfreq(s, 1.0 / SR)
        ph = np.exp(-2j * np.pi * freq[None, None, :] *
                    tau[None, :, None])
        return np.fft.irfft(spec[:, None, :] * ph, n=s,
                            axis=-1).astype(np.float32)

    # syllabic AM *broadband* source (lowpassed noise with a 4 Hz
    # envelope): spatial clustering separates by direction, and a
    # broadband source keeps the CACGMM masks strictly inside (0, 1) —
    # a pure-tone source drives (1 - mask) to exact zero on its bins
    # and the reference's unloaded Rn solve goes singular
    # FULL-BAND source: every bin must see both classes over time
    # (the 4 Hz envelope gates the source) — per-bin single-class
    # saturation leaves the reference's unloaded Rs/Rn covariances
    # rank-deficient and its MVDR solve explodes or raises
    env = (0.5 * (1.0 + np.sin(2 * np.pi * 4.0 * tt))).astype(np.float32)
    src = rng.standard_normal((b, s)).astype(np.float32)
    speech = env[None] * src * 0.8
    speech = speech * (0.5 + 0.5 * rng.random((b, 1)).astype(np.float32))
    # DIFFUSE interference (8 independent white sources spread over the
    # grid) + sensor noise: the cgmm-style CACGMM init separates a
    # directional source from a diffuse field (its noise class is the
    # identity covariance); a single point interferer lands in the
    # sample-covariance class together with the speech and the masks
    # saturate — and saturated masks make the reference's unloaded Rn
    # solve singular (its CLI skips such utterances,
    # apply_adaptive_beamformer.py:170-172)
    img = place(speech, doa_deg)
    wav = img.copy()
    for deg in np.linspace(10, 170, 8):
        wav += place(
            rng.standard_normal((b, s)).astype(np.float32) * 0.10, deg)
    wav += rng.standard_normal(wav.shape).astype(np.float32) * 0.05
    # also return the dry source image at mic 0 — EM pipelines are
    # chaotic at the waveform level across float precisions, so the
    # artifact reports output QUALITY (Si-SDR vs the source) for both
    # the TPU and the reference pipeline alongside the direct
    # TPU-vs-reference Si-SDR
    return wav.astype(np.float32), img[:, 0].astype(np.float32)


# ---------------------------------------------------------------------------
# cascade A: CACGMM -> mask -> MVDR
# ---------------------------------------------------------------------------

def _pick_speech_class(gamma, power):
    """EM class order is arbitrary: take the class with the larger
    mask-weighted mic-0 power as speech (gamma (2, B, F, T),
    power (B, F, T))."""
    e0 = jnp.sum(gamma[0] * power, axis=(-2, -1))
    e1 = jnp.sum(gamma[1] * power, axis=(-2, -1))
    return jnp.where((e0 >= e1)[:, None, None], gamma[0], gamma[1])


def cascade_a_tpu(wav):
    spec = forward_stft(wav, cfg)                     # (B, N, T, F)
    obs = jnp.transpose(spec, (0, 3, 1, 2))           # (B, F, N, T)
    gamma, _ = cacgmm_em(obs, 2, num_iters=20, cgmm_init=True)
    power = jnp.abs(obs[:, :, 0]) ** 2                # (B, F, T)
    mask = jnp.transpose(_pick_speech_class(gamma, power), (0, 2, 1))
    return enhance_batch(wav, mask, cfg, beamformer="mvdr")


def cascade_a_reference(wav):
    """The reference numpy pipeline, per utterance on host CPU."""
    import reference_oracle as ro
    outs = []
    for b in range(wav.shape[0]):
        with on_host():
            spec = np.asarray(forward_stft(jnp.asarray(wav[b]), cfg))
        obs_mft = spec.transpose(0, 2, 1)             # M x F x T
        trainer = ro.ref_cluster.CacgmmTrainer(obs_mft, 2, cgmm_init=True)
        gamma = trainer.train(20)                     # K x F x T
        power = np.abs(obs_mft[0]) ** 2               # F x T
        k = int(np.argmax([np.sum(g * power) for g in gamma]))
        mask = gamma[k].T                             # T x F
        mvdr = ro.ref_beamformer.MvdrBeamformer(cfg.num_bins)
        enh = mvdr.run(mask, obs_mft)                 # F x T
        with on_host():
            outs.append(np.asarray(inverse_stft(
                jnp.asarray(np.ascontiguousarray(enh.T)), cfg,
                nsamps=wav.shape[-1])))
    return np.stack(outs)


# ---------------------------------------------------------------------------
# cascade B: WPE -> SRP-PHAT DoA -> superdirective beamformer
# ---------------------------------------------------------------------------

SV = linear_steer_vector(TOPO, DOAS, cfg.num_bins)    # (A, F, N)
SV_NF = np.transpose(SV, (0, 2, 1)).copy()            # (A, N, F)
PAIRS = tuple(list(x) for x in zip(*[(i, j) for i in range(N_MICS)
                                     for j in range(i + 1, N_MICS)]))
DIFFUSE = diffuse_covar(cfg.num_bins, linear_distance_matrix(TOPO))


def cascade_b_tpu(wav, nsamps):
    spec = forward_stft(wav, cfg)                     # (B, N, T, F)
    obs = jnp.transpose(spec, (0, 3, 1, 2))           # (B, F, N, T)
    der = wpe(obs, taps=10, delay=3, context=1, num_iters=3)
    der_stft = jnp.transpose(der, (0, 2, 3, 1))       # (B, N, T, F)
    sv_nf = jnp.asarray(SV_NF)
    idx = jax.vmap(lambda x: srp_ssl(x, sv_nf, PAIRS))(der_stft)  # (B,)
    steer = jnp.take(jnp.asarray(SV), idx, axis=0)    # (B, F, N)
    # same steer/N scaling as the reference LinearSDBeamformer
    # (/root/reference/scripts/sptk/libs/beamformer.py:430-460) and our
    # classic-beamformer CLI
    w = bf.sd_weights(
        steer / N_MICS,
        jnp.broadcast_to(jnp.asarray(DIFFUSE),
                         steer.shape[:-1] + (N_MICS, N_MICS)))
    enh = bf.beamform(w, der)                         # (B, F, T)
    out = inverse_stft(jnp.swapaxes(enh, -1, -2), cfg, nsamps=nsamps)
    return out, idx


def cascade_b_reference(wav):
    import reference_oracle as ro
    outs, doas = [], []
    for b in range(wav.shape[0]):
        with on_host():
            spec = np.asarray(forward_stft(jnp.asarray(wav[b]), cfg))
        obs_fnt = spec.transpose(2, 0, 1)             # F x N x T
        der = ro.ref_wpe.wpe(obs_fnt, taps=10, delay=3, context=1,
                             num_iters=3)             # F x N x T
        der_ntf = der.transpose(1, 2, 0)              # N x T x F
        idx = ro.ref_ssl.srp_ssl(der_ntf, SV_NF, srp_pair=PAIRS)
        sd = ro.ref_beamformer.LinearSDBeamformer(TOPO)
        w = sd.weight(DOAS[idx], cfg.num_bins)        # F x N
        enh = np.einsum("...n,...nt->...t", w.conj(), der)
        with on_host():
            outs.append(np.asarray(inverse_stft(
                jnp.asarray(np.ascontiguousarray(enh.T)), cfg,
                nsamps=wav.shape[-1])))
        doas.append(int(idx))
    return np.stack(outs), doas


def main():
    out = {}

    # ---- throughput rows (B=32 x 4 s) ----
    B, SECS = 32, 4
    wav, _ = simulate(B, SECS, seed=0)
    wav_d = jax.device_put(wav)

    def body_a(w):
        o = cascade_a_tpu(w)
        return w * 0.9999 + jnp.mean(o)[None, None, None] * 1e-9

    print("compiling + timing cascade A chain...", flush=True)
    rate_a = timed_scan("cascade A: CACGMM->mask->MVDR B=32 x 4 s",
                        body_a, wav_d, B * SECS, iters=8)

    def body_b(w):
        o, _ = cascade_b_tpu(w, w.shape[-1])
        return w * 0.9999 + jnp.mean(o)[None, None, None] * 1e-9

    print("compiling + timing cascade B chain...", flush=True)
    rate_b = timed_scan("cascade B: WPE->SRP->SD B=32 x 4 s",
                        body_b, wav_d, B * SECS, iters=8)

    # ---- reference parity (2 utterances; the reference pipeline is
    # per-utterance numpy and CACGMM alone costs ~1 min/utt) ----
    wav_p, dry_p = simulate(2, 4, seed=7)

    def sis(x, y):
        return [round(float(si_snr(jnp.asarray(x[b]), jnp.asarray(y[b]))),
                      2) for b in range(x.shape[0])]

    tpu_a = np.asarray(jax.jit(cascade_a_tpu)(jax.device_put(wav_p)))
    ref_a = cascade_a_reference(wav_p)
    # the reference MVDR steer is a LAPACK eigenvector with arbitrary
    # per-bin phase (our steer is deterministically mic-0-anchored), so
    # waveform-level comparison is phase-bounded; magnitude cosine is
    # the parity surface, as for the committed doc goldens
    def mcos(x, y):
        with on_host():
            ma = np.abs(np.asarray(forward_stft(jnp.asarray(x), cfg)))
            mb = np.abs(np.asarray(forward_stft(jnp.asarray(y), cfg)))
        return [round(float(
            np.inner(ma[b].ravel(), mb[b].ravel()) /
            (np.linalg.norm(ma[b]) * np.linalg.norm(mb[b]))), 4)
            for b in range(x.shape[0])]

    cos_a = mcos(tpu_a, ref_a)
    qual_a = {"tpu": sis(tpu_a, dry_p), "reference": sis(ref_a, dry_p),
              "input": sis(wav_p[:, 0], dry_p)}
    print(f"cascade A: magnitude cosine vs reference {cos_a}; "
          f"quality vs source {qual_a}", flush=True)

    fn_b = jax.jit(lambda w: cascade_b_tpu(w, w.shape[-1]))
    tpu_b, idx_b = fn_b(jax.device_put(wav_p))
    tpu_b, idx_b = np.asarray(tpu_b), np.asarray(idx_b)
    ref_b, doa_ref = cascade_b_reference(wav_p)
    si_b = sis(tpu_b, ref_b)
    qual_b = {"tpu": sis(tpu_b, dry_p), "reference": sis(ref_b, dry_p)}
    print(f"cascade B: Si-SDR vs reference {si_b} dB; quality {qual_b}; "
          f"DoA tpu {idx_b.tolist()} ref {doa_ref} (true 60)", flush=True)

    probe = probe_overhead_ms()
    print(f"probe: fixed chained-dispatch overhead {probe:.2f} ms",
          flush=True)
    out = {
        "rows": {
            "cascade A: CACGMM->mask->MVDR B=32 x 4 s": {
                "audio_s_per_s": round(rate_a, 1),
                "magnitude_cosine_vs_reference": cos_a,
                "si_sdr_vs_source_db": qual_a,
            },
            "cascade B: WPE->SRP-PHAT->SD B=32 x 4 s": {
                "audio_s_per_s": round(rate_b, 1),
                "si_sdr_vs_reference_db": si_b,
                "si_sdr_vs_source_db": qual_b,
                "doa_tpu": idx_b.tolist(),
                "doa_reference": doa_ref,
            },
        },
        "probe_overhead_ms": round(probe, 2),
    }
    if len(sys.argv) > 1:
        with open(sys.argv[1], "w") as f:
            json.dump(out, f, indent=1)
        print(f"wrote {sys.argv[1]}", flush=True)


if __name__ == "__main__":
    main()
