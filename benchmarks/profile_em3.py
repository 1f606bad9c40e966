#!/usr/bin/env python
"""Fused CACGMM EM floor attribution (VERDICT r2 weak #1 / next #7).

The in-kernel iteration = K x M(M+1)/2 T-length covariance reductions
(T-proportional) + cyclic Jacobi inverse (sweeps-proportional,
T-independent) + K x M^2 quadratic forms (T-proportional) + posterior.
Timing the kernel across (T, sweeps) pairs solves the attribution:
the T-slope is the covariance+quad VPU cost, the sweeps-slope is the
Jacobi cost, the remainder is fixed overhead.
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
from setk_tpu.enhance.cluster import norm_observation
from setk_tpu.ops.pallas.cacgmm_em import cacgmm_em_pallas

cfg = StftConfig()
SR = 16000
rng = np.random.default_rng(0)
B, K, ITERS = 32, 2, 20


def main():
    probe = probe_overhead_ms()
    print(f"probe overhead: {probe:.2f} ms", flush=True)
    for secs in (4, 2):
        w = (rng.standard_normal((B, 6, secs * SR)) * 0.2).astype(
            np.float32)
        spec = forward_stft(jnp.asarray(w), cfg)
        obs = norm_observation(jnp.transpose(spec, (0, 3, 1, 2)), axis=-2)
        obs = jax.device_put(obs)
        f, m, t = obs.shape[-3:]
        g0 = jnp.broadcast_to(
            jnp.asarray(rng.random((K, B, f, t)).astype(np.float32)),
            (K, B, f, t))
        g0 = g0 / jnp.sum(g0, 0, keepdims=True)
        k0 = jnp.ones((K, B, f, t), jnp.float32)
        g0, k0 = jax.device_put(g0), jax.device_put(k0)
        for sweeps in (6, 3, 1):

            def body(c, _sw=sweeps):
                o, s = c
                gamma, _ = cacgmm_em_pallas(o, g0, k0, ITERS, sweeps=_sw)
                return (o * 0.9999,
                        s + jnp.mean(gamma).astype(jnp.float32) * 1e-9)

            timed_scan(f"fused EM T={t} sweeps={sweeps}", body,
                       (obs, jnp.zeros(())), B * secs, iters=12)
        # iteration-count slope at this T (per-iteration cost)
        for iters in (10,):

            def body10(c):
                o, s = c
                gamma, _ = cacgmm_em_pallas(o, g0, k0, iters)
                return (o * 0.9999,
                        s + jnp.mean(gamma).astype(jnp.float32) * 1e-9)

            timed_scan(f"fused EM T={t} iters={iters}", body10,
                       (obs, jnp.zeros(())), B * secs, iters=12)


if __name__ == "__main__":
    main()
