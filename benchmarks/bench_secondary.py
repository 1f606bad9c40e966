#!/usr/bin/env python
"""Secondary throughput rows of README.md, reproducible on the chip.

Rows (bench.py measures the headline B=128 x 8 s MVDR row):
  * mask-based MVDR enhance, B=32 x 4 s (small-batch / latency regime)
  * the beamformer family at the headline shape
  * batched CACGMM, 20 EM iterations (B=8 and B=32, 4 s, 6 ch)
  * batched WPE (B=32, 6 ch, 8 s, 10 taps, 3 iterations)

Chain lengths are sized so the remote runtime's fixed per-call overhead
(measured ~2.5 ms on 2026-08-17, ~25 ms on 2026-08-19 — it varies with
tunnel load) stays well under 10% of each row.

Run: python benchmarks/bench_secondary.py [out.json]   (real TPU;
~15 min with compiles).  Prints one line per row; writes the JSON rows
artifact (the per-round BENCH_SECONDARY_r*.json evidence) when a path
is given.
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
from setk_tpu.enhance.cluster import cacgmm_em, cgmm_em
from setk_tpu.enhance.wpe import wpd, wpe
from setk_tpu.parallel.enhance_step import enhance_batch

cfg = StftConfig()
SR = 16000
rng = np.random.default_rng(0)
ROWS = {}


def row(name, body, init, audio_s, iters):
    rate = timed_scan(name, body, init, audio_s, iters=iters)
    ROWS[name] = {"audio_s_per_s": round(rate, 1)}
    return rate


def main():
    # --- small-batch MVDR (B=32 x 4 s, int16 PCM input) ---
    B, N, S = 32, 6, 4 * SR
    wav = jax.device_put((rng.standard_normal((B, N, S)) * 3000).astype(
        np.int16))
    mask = jax.device_put(
        rng.random((B, cfg.num_frames(S), cfg.num_bins)).astype(np.float32))

    def mvdr_body(m):
        out = enhance_batch(wav, m, cfg, beamformer="mvdr")
        return m * 0.999 + jnp.mean(out)[None, None, None] * 1e-9

    row("MVDR B=32 x 4 s", mvdr_body, mask, B * 4, iters=40)

    # --- beamformer family at the headline shape (B=128 x 8 s) ---
    BF, SF = 128, 8 * SR
    wavf = jax.device_put(
        (rng.standard_normal((BF, 6, SF)) * 3000).astype(np.int16))
    maskf = jax.device_put(
        rng.random((BF, cfg.num_frames(SF), cfg.num_bins)).astype(
            np.float32))
    # ONLINE chunked-EMA MVDR through the fused online kernel pair
    # (round-2 commit 7f3a7b8 measured ~94k; this row makes it a
    # committed artifact)
    def online_body(m):
        out = enhance_batch(wavf, m, cfg, beamformer="mvdr",
                            chunk_size=32)
        return m * 0.999 + jnp.mean(out)[None, None, None] * 1e-9

    row("ONLINE MVDR chunk=32 B=128 x 8 s", online_body, maskf, BF * 8,
        iters=12)

    for name, kw in (("gevd", {}), ("mpdr", {}), ("mpdr-whiten", {}),
                     ("pmwf-0", {}), ("mvdr+ban", {"ban": True})):
        bf_name = "mvdr" if name == "mvdr+ban" else name

        def fam_body(m, _bf=bf_name, _kw=dict(kw)):
            out = enhance_batch(wavf, m, cfg, beamformer=_bf, **_kw)
            return m * 0.999 + jnp.mean(out)[None, None, None] * 1e-9

        row(f"{name} B=128 x 8 s", fam_body, maskf, BF * 8, iters=12)

    # --- CACGMM / CGMM, 20 EM iterations (fused in-VMEM kernel) ---
    for BE in (8, 32):
        SE = 4 * SR
        we = (rng.standard_normal((BE, 6, SE)) * 0.2).astype(np.float32)
        spec = forward_stft(jnp.asarray(we), cfg)
        obs = jax.device_put(jnp.transpose(spec, (0, 3, 1, 2)))

        def em_body(o):
            gamma, _ = cacgmm_em(o, 2, num_iters=20)
            return o * 0.9999 + jnp.mean(gamma).astype(o.dtype) * 1e-9

        row(f"CACGMM 20 it B={BE} x 4 s", em_body, obs, BE * 4, iters=12)

        if BE == 32:

            def cg_body(o):
                gamma, _ = cgmm_em(o, 2, num_iters=20)
                return o * 0.9999 + jnp.mean(gamma).astype(o.dtype) * 1e-9

            row(f"CGMM 20 it B={BE} x 4 s", cg_body, obs, BE * 4,
                iters=12)

            # --- factored WPD (3 outer iters, CGMM 10, 10 taps) ---
            def wpd_body(o):
                _, enh = wpd(o, cgmm_iters=10, wpd_iters=3, taps=10,
                             delay=3)
                return o * 0.9999 + jnp.mean(
                    jnp.abs(enh)).astype(o.dtype) * 1e-9

            row(f"WPD B={BE} x 4 s (3 outer, CGMM 10)", wpd_body, obs,
                BE * 4, iters=4)

    # --- WPE (B=32, 6 ch, 8 s, 10 taps, 3 iterations) ---
    BW, SW = 32, 8 * SR
    ww = (rng.standard_normal((BW, 6, SW)) * 0.2).astype(np.float32)
    specw = forward_stft(jnp.asarray(ww), cfg)
    obsw = jax.device_put(jnp.transpose(specw, (0, 3, 1, 2)))

    def wpe_body(o):
        d = wpe(o, taps=10, delay=3, context=1, num_iters=3)
        return o * 0.9999 + jnp.mean(jnp.abs(d)).astype(o.dtype) * 1e-9

    row("WPE B=32 x 8 s (10 taps, 3 it)", wpe_body, obsw, BW * 8, iters=6)

    probe = probe_overhead_ms()
    print(f"probe: fixed chained-dispatch overhead {probe:.2f} ms",
          flush=True)
    if len(sys.argv) > 1:
        with open(sys.argv[1], "w") as f:
            json.dump({"rows": ROWS,
                       "probe_overhead_ms": round(probe, 2)}, f, indent=1)
        print(f"wrote {sys.argv[1]}", flush=True)


if __name__ == "__main__":
    main()
