#!/usr/bin/env python
"""Latency-regime bench: per-utterance latency at small B + streaming.

The reference's native operating point is ONE utterance at a time
(/root/reference/scripts/sptk/apply_adaptive_beamformer.py:130 loops
utterances; src/apply-supervised-mvdr.cc:196-226); every committed
throughput row is a B>=8 chained-batch number.  This bench reports

  * ms per 4-s utterance at B in {1, 4, 8, 32, 128} for MVDR and
    B in {1, 4, 8, 32} for CACGMM (the small-batch cliff, VERDICT r03
    next #9): per-step time with the day's fixed chained-dispatch
    overhead (probe, divided by the chain length) subtracted, so
    KERNEL-side latency is visible apart from the tunnel's ~2.5-25 ms
    per-dispatch cost;
  * WPE at B=1 x 8 s (10 taps, 3 iters);
  * steady-state per-chunk latency of the ONLINE fused MVDR path at
    B=1 (chunk = 32 frames = 0.512 s of audio): the fused online scan
    processes all chunks in one program, so ms/chunk = step/chunks is
    the steady-state streaming rate (a single-chunk dispatch would
    measure the tunnel, not the kernel).

Run: python benchmarks/bench_latency.py [out.json]  (real TPU).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from _timing import probe_overhead_ms, timed_scan
from setk_tpu.dsp.stft import StftConfig, forward_stft
from setk_tpu.enhance.cluster import cacgmm_em
from setk_tpu.enhance.wpe import wpe
from setk_tpu.parallel.enhance_step import enhance_batch

cfg = StftConfig()
SR = 16000
rng = np.random.default_rng(0)
ROWS = {}


def row(name, body, init, audio_s, iters, batch, probe):
    import time

    @jax.jit
    def run(c):
        def f(c, _):
            return body(c), ()

        c, _ = jax.lax.scan(f, c, None, length=iters)
        return c

    first = lambda c: c[0] if isinstance(c, tuple) else c
    c = run(init)
    float(jnp.sum(jnp.abs(first(c))))
    # min of two timed chains: the tunnel's transient stalls only ADD
    # time, so the min is the stall-resistant estimator for these
    # short rows (a single 20 ms hiccup once polluted one row 4x)
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        c = run(c)
        float(jnp.sum(jnp.abs(first(c))))
        best = min(best, time.perf_counter() - t0)
    step_ms = best * 1e3 / iters
    # clamp at the measurement resolution: tiny kernels (B=1 MVDR is
    # ~60 us) can land below the probe estimate's run-to-run noise
    kern_ms = max(step_ms - probe / iters, 1e-2)
    utt_ms = kern_ms / batch
    rate = audio_s / (kern_ms * 1e-3)
    print(f"{name:>44}: {step_ms:8.2f} ms/step  "
          f"kernel {kern_ms:8.2f} ms  {utt_ms:7.2f} ms/utt  "
          f"({rate:9.0f} audio-s/s)", flush=True)
    ROWS[name] = {"step_ms": round(step_ms, 2),
                  "kernel_ms": round(kern_ms, 2),
                  "ms_per_utt": round(utt_ms, 3),
                  "audio_s_per_s": round(rate, 1)}


def main():
    probe = probe_overhead_ms()
    print(f"probe: fixed chained-dispatch overhead {probe:.2f} ms",
          flush=True)

    # --- MVDR batch sweep, 4-s utterances ---
    for B in (1, 4, 8, 32, 128):
        S = 4 * SR
        wav = jax.device_put(
            (rng.standard_normal((B, 6, S)) * 3000).astype(np.int16))
        mask = jax.device_put(rng.random(
            (B, cfg.num_frames(S), cfg.num_bins)).astype(np.float32))

        def mvdr_body(m):
            out = enhance_batch(wav, m, cfg, beamformer="mvdr")
            return m * 0.999 + jnp.mean(out)[None, None, None] * 1e-9

        row(f"MVDR B={B} x 4 s", mvdr_body, mask, B * 4,
            iters=40, batch=B, probe=probe)

    # --- ONLINE fused MVDR at B=1: per-chunk streaming latency ---
    S = 4 * SR
    wav1 = jax.device_put(
        (rng.standard_normal((1, 6, S)) * 3000).astype(np.int16))
    mask1 = jax.device_put(rng.random(
        (1, cfg.num_frames(S), cfg.num_bins)).astype(np.float32))
    chunk = 32
    n_chunks = (cfg.num_frames(S) + chunk - 1) // chunk

    def online_body(m):
        out = enhance_batch(wav1, m, cfg, beamformer="mvdr",
                            chunk_size=chunk)
        return m * 0.999 + jnp.mean(out)[None, None, None] * 1e-9

    row(f"ONLINE MVDR B=1 x 4 s (chunk={chunk} frames)", online_body,
        mask1, 4, iters=40, batch=1, probe=probe)
    r = ROWS[f"ONLINE MVDR B=1 x 4 s (chunk={chunk} frames)"]
    r["ms_per_chunk"] = round(r["kernel_ms"] / n_chunks, 3)
    r["chunk_audio_ms"] = round(chunk * cfg.frame_hop / SR * 1e3, 1)
    print(f"    -> {r['ms_per_chunk']} ms per {r['chunk_audio_ms']} ms "
          f"chunk ({n_chunks} chunks)", flush=True)

    # --- CACGMM batch sweep, 20 EM iterations ---
    for B in (1, 4, 8, 32):
        S = 4 * SR
        we = (rng.standard_normal((B, 6, S)) * 0.2).astype(np.float32)
        spec = forward_stft(jnp.asarray(we), cfg)
        obs = jax.device_put(jnp.transpose(spec, (0, 3, 1, 2)))

        def em_body(o):
            gamma, _ = cacgmm_em(o, 2, num_iters=20)
            return o * 0.9999 + jnp.mean(gamma).astype(o.dtype) * 1e-9

        row(f"CACGMM 20 it B={B} x 4 s", em_body, obs, B * 4,
            iters=16, batch=B, probe=probe)

    # --- WPE at B=1 x 8 s ---
    ww = (rng.standard_normal((1, 6, 8 * SR)) * 0.2).astype(np.float32)
    specw = forward_stft(jnp.asarray(ww), cfg)
    obsw = jax.device_put(jnp.transpose(specw, (0, 3, 1, 2)))

    def wpe_body(o):
        d = wpe(o, taps=10, delay=3, context=1, num_iters=3)
        return o * 0.9999 + jnp.mean(jnp.abs(d)).astype(o.dtype) * 1e-9

    row("WPE B=1 x 8 s (10 taps, 3 it)", wpe_body, obsw, 8,
        iters=12, batch=1, probe=probe)

    if len(sys.argv) > 1:
        with open(sys.argv[1], "w") as f:
            json.dump({"rows": ROWS,
                       "probe_overhead_ms": round(probe, 2)}, f, indent=1)
        print(f"wrote {sys.argv[1]}", flush=True)


if __name__ == "__main__":
    main()
