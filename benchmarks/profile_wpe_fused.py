#!/usr/bin/env python
"""Post-fusion WPE stage budget (VERDICT r2 weak #2).

Cumulative-prefix chained timing of the tap-free fused WPE at the
bench shape (B=32, 6 ch, 8 s, 10 taps, 3 iterations): the full
pipeline, a grams-only chain and a gram+solve chain; stage costs fall
out of the prefix differences (each program chained >= 6x so the
remote runtime's fixed 2.5-25 ms call cost stays in the noise — run
benchmarks/probe_scan.py alongside to know the day's fixed cost).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from _timing import probe_overhead_ms, timed_scan
from setk_tpu.dsp.stft import StftConfig, forward_stft
from setk_tpu.enhance.wpe import wpe
from setk_tpu.ops.linalg import hermitian_solve
from setk_tpu.ops.pallas.cholesky import solve_wpe_gram_pallas
from setk_tpu.ops.pallas.wpe_gram import wpe_apply_pallas, wpe_gram_pallas

cfg = StftConfig()
SR = 16000
rng = np.random.default_rng(0)
B, N, SECS, TAPS, DELAY = 32, 6, 8, 10, 3
AUDIO = B * SECS
COLS = (TAPS + 1) * N
NK = N * TAPS


def main():
    w = (rng.standard_normal((B, N, SECS * SR)) * 0.2).astype(np.float32)
    spec = forward_stft(jnp.asarray(w), cfg)
    obs = jnp.transpose(spec, (0, 3, 1, 2))  # (B,F,N,T)
    t = obs.shape[-1]
    obs_re = jax.device_put(jnp.real(obs).reshape(-1, N, t))
    obs_im = jax.device_put(jnp.imag(obs).reshape(-1, N, t))
    bins = obs_re.shape[0]

    @jax.jit
    def one_filt(o_re, o_im):
        g0 = jnp.zeros((bins, NK, N), jnp.float32)
        gr, gi = wpe_gram_pallas(o_re, o_im, g0, g0, n=N, taps=TAPS,
                                 delay=DELAY, context=1, use_g=False)
        gram = (gr + 1j * gi)[:, :COLS, :COLS]
        return hermitian_solve(gram[:, N:, N:], gram[:, N:, :N])

    filt = one_filt(obs_re, obs_im)
    g_re = jax.device_put(jnp.real(filt).astype(jnp.float32))
    g_im = jax.device_put(jnp.imag(filt).astype(jnp.float32))

    def full_body(c):
        o_re, o_im, s = c
        d = wpe(jax.lax.complex(o_re, o_im).reshape(B, -1, N, t),
                taps=TAPS, delay=DELAY, context=1, num_iters=3,
                use_fused=True)
        return (o_re * 0.9999, o_im * 0.9999,
                s + jnp.mean(jnp.abs(d)) * 1e-12)

    # NOTE the sequential data dependence between the 3 inner calls in
    # both bodies: with identical arguments XLA CSEs repeated pallas
    # calls into ONE — the round-3 first cut of this profile measured
    # "3x gram" at what was really 1x and mis-attributed the step
    # budget to inter-kernel glue (doc/KERNELS.md round-3 budget).
    def grams_body(c):
        o_re, o_im, s = c
        acc = s
        for _ in range(3):
            gr, gi = wpe_gram_pallas(o_re, o_im, g_re, g_im, n=N,
                                     taps=TAPS, delay=DELAY, context=1,
                                     use_g=True)
            acc = acc + jnp.mean(gr) * 1e-12
            o_re = o_re + acc * 1e-30
        return (o_re * 0.9999, o_im * 0.9999, acc)

    def gram_solve_body(c):
        o_re, o_im, s = c
        acc = s
        f_re, f_im = g_re, g_im
        for _ in range(3):
            gr, gi = wpe_gram_pallas(o_re, o_im, f_re, f_im, n=N,
                                     taps=TAPS, delay=DELAY, context=1,
                                     use_g=True)
            f_re, f_im = solve_wpe_gram_pallas(gr, gi, row0=N, n=NK, k=N,
                                               eps_rel=8e-6 * NK,
                                               equilibrate=True)
            acc = acc + jnp.mean(jnp.abs(f_re) + jnp.abs(f_im)) * 1e-12
        return (o_re * 0.9999, o_im * 0.9999, acc)

    def apply_body(c):
        o_re, o_im, s = c
        dr, di = wpe_apply_pallas(o_re, o_im, g_re, g_im, n=N, taps=TAPS,
                                  delay=DELAY)
        return (o_re * 0.9999, o_im * 0.9999, s + jnp.mean(dr) * 1e-12)

    init = (obs_re, obs_im, jnp.zeros(()))
    probe = probe_overhead_ms()
    print(f"probe overhead: {probe:.2f} ms", flush=True)
    timed_scan("full fused WPE (3 it)", full_body, init, AUDIO, iters=6)
    timed_scan("3x gram (use_g)", grams_body, init, AUDIO, iters=6)
    timed_scan("3x gram+solve", gram_solve_body, init, AUDIO, iters=6)
    timed_scan("1x apply", apply_body, init, AUDIO, iters=12)
    # reference point for the planar solver itself at this shape
    gr0, gi0 = jax.jit(lambda r, i: wpe_gram_pallas(
        r, i, g_re, g_im, n=N, taps=TAPS, delay=DELAY, context=1,
        use_g=True))(obs_re, obs_im)
    gr0, gi0 = jax.device_put(gr0), jax.device_put(gi0)

    def solve_body(c):
        gr, gi, s = c
        fr, fi = solve_wpe_gram_pallas(gr, gi, row0=N, n=NK, k=N,
                                       eps_rel=8e-6 * NK,
                                       equilibrate=True)
        return (gr * 0.9999, gi * 0.9999,
                s + jnp.mean(jnp.abs(fr) + jnp.abs(fi)) * 1e-12)

    timed_scan("1x planar solve (60x60 x 8224)", solve_body,
               (gr0, gi0, jnp.zeros(())), AUDIO, iters=12)


if __name__ == "__main__":
    main()
