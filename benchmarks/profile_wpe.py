#!/usr/bin/env python
"""On-chip WPE stage budget (VERDICT r1 weak #2).

Chained timing (>= 8 reps per program to swamp the remote runtime's
fixed per-call overhead, ~25 ms on 2026-08-19) of the full 3-iteration
WPE and each stage at the bench shape (B=32, 6 ch, 8 s, 10 taps).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from _timing import timed_scan
from setk_tpu.dsp.stft import StftConfig, forward_stft
from setk_tpu.enhance.wpe import (compute_lambda, compute_tap_mat, wpe,
                                  wpe_step)
from setk_tpu.utils.common import EPSILON, GRAM_PRECISION
from setk_tpu.ops.linalg import hermitian_solve

cfg = StftConfig()
SR = 16000
rng = np.random.default_rng(0)
B, N, SECS, TAPS, DELAY = 32, 6, 8, 10, 3
AUDIO = B * SECS


def main():
    w = (rng.standard_normal((B, N, SECS * SR)) * 0.2).astype(np.float32)
    spec = forward_stft(jnp.asarray(w), cfg)
    obs = jax.device_put(jnp.transpose(spec, (0, 3, 1, 2)))  # (B,F,N,T)

    def wpe_body(o):
        d = wpe(o, taps=TAPS, delay=DELAY, context=1, num_iters=3)
        return o * 0.9999 + jnp.mean(jnp.abs(d)).astype(o.dtype) * 1e-9

    timed_scan("WPE 3it full", wpe_body, obs, AUDIO, iters=8)

    # --- stages (each chained 12x, complex arrays ride the carry) -----
    def taps_body(c):
        o, s = c
        tm = compute_tap_mat(o, TAPS, DELAY)
        return (o * 0.9999, s + jnp.mean(jnp.abs(tm)) * 1e-12)

    timed_scan("stage tap-mat", taps_body,
               (obs, jnp.zeros(())), AUDIO, iters=12)

    def lam_body(c):
        o, s = c
        lam = compute_lambda(o, context=1)
        return (o * 0.9999, s + jnp.mean(lam) * 1e-12)

    timed_scan("stage lambda", lam_body, (obs, jnp.zeros(())), AUDIO,
               iters=12)

    @jax.jit
    def setup(o):
        tm = compute_tap_mat(o, TAPS, DELAY)
        lam = jnp.maximum(compute_lambda(o, context=1), EPSILON)
        s = jax.lax.rsqrt(lam)[..., None, :]
        y2 = jnp.concatenate([o * s, tm * s], axis=-2)
        gram = jnp.einsum("...mt,...nt->...mn", y2, jnp.conj(y2),
                          precision=GRAM_PRECISION)
        corr = gram[..., N:, N:]
        cross = gram[..., N:, :N]
        filt = hermitian_solve(corr, cross)
        return tm, lam, gram, filt

    tm, lam, gram, filt = setup(obs)

    def gram_body(c):
        o, tm, lam = c
        s = jax.lax.rsqrt(lam)[..., None, :]
        y2 = jnp.concatenate([o * s, tm * s], axis=-2)
        g = jnp.einsum("...mt,...nt->...mn", y2, jnp.conj(y2),
                       precision=GRAM_PRECISION)
        return (o * 0.9999 + jnp.mean(jnp.abs(g)).astype(o.dtype) * 1e-12,
                tm, lam)

    timed_scan("stage y2+gram (highest)", gram_body, (obs, tm, lam),
               AUDIO, iters=8)

    def gram_high_body(c):
        o, tm, lam = c
        s = jax.lax.rsqrt(lam)[..., None, :]
        y2 = jnp.concatenate([o * s, tm * s], axis=-2)
        g = jnp.einsum("...mt,...nt->...mn", y2, jnp.conj(y2),
                       precision="high")
        return (o * 0.9999 + jnp.mean(jnp.abs(g)).astype(o.dtype) * 1e-12,
                tm, lam)

    timed_scan("stage y2+gram (high)", gram_high_body, (obs, tm, lam),
               AUDIO, iters=8)

    def solve_body(c):
        g, s = c
        corr = g[..., N:, N:]
        cross = g[..., N:, :N]
        filt = hermitian_solve(corr, cross)
        return (g * 0.9999, s + jnp.mean(jnp.abs(filt)) * 1e-12)

    timed_scan("stage solve", solve_body, (gram, jnp.zeros(())), AUDIO,
               iters=12)

    def apply_body(c):
        o, tm, fl = c
        d = o - jnp.einsum("...na,...nb->...ab", jnp.conj(fl), tm,
                           precision=GRAM_PRECISION)
        return (o * 0.9999 + jnp.mean(jnp.abs(d)).astype(o.dtype) * 1e-12,
                tm, fl)

    timed_scan("stage apply", apply_body, (obs, tm, filt), AUDIO,
               iters=12)


if __name__ == "__main__":
    main()
