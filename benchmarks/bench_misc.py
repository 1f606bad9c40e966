#!/usr/bin/env python
"""Throughput rows for the previously-unbenched four: OM-LSA/iMCRA
noise suppression, AuxIVA, the three SSL backends, and Griffin-Lim
(round-4 verdict weak #5) — each with a placement verdict
(TPU-fused / TPU-acceptable / pin-to-host) recorded in doc/KERNELS.md.

All complex inputs are built ON DEVICE from planar re/im pushes (axon
cannot transfer complex); every row is a chained lax.scan with min-of-2
timing (benchmarks/_timing.timed_scan) and the dispatch probe committed
alongside.  Writes BENCH_MISC_r05.json.

References: /root/reference/scripts/sptk/libs/ns.py:56-209,
apply_auxiva.py:24-57, libs/ssl.py:12-110, libs/utils.py:176-207
(Griffin-Lim).
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

SR = 16000
ROWS = {}


def main():
    import jax
    import jax.numpy as jnp
    from _timing import probe_overhead_ms, timed_scan
    from setk_tpu.dsp import StftConfig
    from setk_tpu.dsp.griffin_lim import griffin_lim
    from setk_tpu.enhance.auxiva import auxiva
    from setk_tpu.enhance.ns import omlsa
    from setk_tpu.spatial.ssl import ml_ssl, music_ssl, srp_ssl
    from setk_tpu.spatial.steer import linear_steer_vector

    cfg = StftConfig()
    rng = np.random.default_rng(0)
    probe = probe_overhead_ms()
    print(f"probe: {probe:.2f} ms", flush=True)

    def cpx(shape, scale=1.0):
        re = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
        im = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
        return re * scale, im * scale

    def record(name, rate, verdict):
        ROWS[name] = {"audio_s_per_s": round(rate, 1), "verdict": verdict}

    # ---- OM-LSA / iMCRA: frame-sequential scan, vmapped over B -------
    for b in (1, 32):
        t_f, f = cfg.num_frames(4 * SR), cfg.num_bins
        re, im = cpx((b, t_f, f), 0.1)

        def ns_body(carry, _re=re, _im=im):
            r, i = carry
            gain = jax.vmap(lambda rr, ii: omlsa(rr + 1j * ii))(r, i)
            return (r * 0.999 + gain * 1e-6, i)

        rate = timed_scan(f"omlsa-imcra B={b} x 4 s", ns_body, (re, im),
                          b * 4, iters=4)
        record(f"omlsa-imcra B={b} x 4 s", rate,
               "TPU-fused batched / TPU-acceptable solo: the "
               "frame-sequential scan is issue-bound and FLAT in B "
               "(r05: 6.99 vs 6.87 ms at B=1/32) -- batching is free")

    # ---- AuxIVA: 3 sources, 8 s, 20 epochs ---------------------------
    t_f = cfg.num_frames(8 * SR)
    re, im = cpx((3, t_f, cfg.num_bins))

    def iva_body(carry):
        r, i = carry
        y = auxiva(r + 1j * i, epochs=20)
        return (r * 0.999 + jnp.real(y) * 1e-6, i)

    rate = timed_scan("auxiva N=3 x 8 s (20 epochs)", iva_body, (re, im),
                      8, iters=4)
    record("auxiva N=3 x 8 s (20 epochs)", rate,
           "TPU-acceptable: ~330x realtime; W^H V is non-Hermitian so "
           "the per-bin LU stays (lane-batched Cholesky inapplicable)")

    # ---- SSL: three backends, 6 mics, 4 s, 121-point grid ------------
    t_f = cfg.num_frames(4 * SR)
    doa = np.linspace(0, 180, 121)
    sv = np.asarray(linear_steer_vector(np.linspace(0, 0.25, 6), doa,
                                        cfg.num_bins, sr=SR))  # (A, F, M)
    sv = sv.transpose(0, 2, 1)                                  # (A, M, F)
    svr = jnp.asarray(np.real(sv).astype(np.float32))
    svi = jnp.asarray(np.imag(sv).astype(np.float32))
    re, im = cpx((6, t_f, cfg.num_bins), 0.1)
    pair_l, pair_r = np.triu_indices(6, k=1)

    def run_ssl(name, r, i):
        if name == "ml":
            return ml_ssl(r + 1j * i, svr + 1j * svi, return_scores=True)
        if name == "srp":
            return srp_ssl(r + 1j * i, svr + 1j * svi, (pair_l, pair_r),
                           return_scores=True)
        return music_ssl(r + 1j * i, svr + 1j * svi, return_scores=True)

    for name in ("ml", "srp", "music"):

        def ssl_body(carry, _n=name):
            r, i = carry
            _, scores = run_ssl(_n, r, i)
            return (r * 0.999 + jnp.mean(scores) * 1e-9, i)

        rate = timed_scan(f"ssl-{name} 6ch x 4 s (121 doa)", ssl_body,
                          (re, im), 4, iters=8)
        record(f"ssl-{name} 6ch x 4 s (121 doa)", rate,
               "TPU-fused: one jitted grid scoring, ~3 ms/utt")

    # ---- Griffin-Lim: B=32 x 4 s magnitudes, 30 epochs ---------------
    t_f = cfg.num_frames(4 * SR)
    mag = jnp.asarray(
        np.abs(rng.standard_normal((32, t_f, cfg.num_bins))).astype(
            np.float32))

    def gl_body(m):
        samps = griffin_lim(m, cfg, epochs=30)
        return m * 0.999 + jnp.mean(jnp.abs(samps)) * 1e-9

    rate = timed_scan("griffin-lim B=32 x 4 s (30 epochs)", gl_body, mag,
                      32 * 4, iters=4)
    record("griffin-lim B=32 x 4 s (30 epochs)", rate,
           "TPU-fused: batched STFT round-trip epochs")

    out = {"rows": ROWS, "probe_overhead_ms": round(probe, 2)}
    path = Path(__file__).resolve().parent.parent / "BENCH_MISC_r05.json"
    with open(path, "w") as fd:
        json.dump(out, fd, indent=1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
