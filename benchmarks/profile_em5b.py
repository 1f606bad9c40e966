#!/usr/bin/env python
"""Same-process two-pass (r04) vs single-pass (r05) EM kernel compare.

Cross-day probe drift (25.1 -> 28.3 ms between the r04 and r05
attribution runs) makes cross-run kernel comparisons unreliable; this
times BOTH kernel generations in one process on identical inputs.
benchmarks/_em_twopass_r04.py is a verbatim snapshot of the round-4
kernel module (git 884e73d^).
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))


def main():
    import jax
    import jax.numpy as jnp
    from _timing import probe_overhead_ms, timed_scan
    import _em_twopass_r04 as old
    from setk_tpu.enhance.cluster import norm_observation
    from setk_tpu.ops.pallas import cacgmm_em as new

    rng = np.random.default_rng(0)
    B, F, M, T, K, ITERS = 32, 257, 6, 251, 2, 20
    probe = probe_overhead_ms()
    print(f"probe: {probe:.2f} ms", flush=True)
    audio = B * 4

    re = jnp.asarray(rng.standard_normal((B, F, M, T)).astype(np.float32))
    im = jnp.asarray(rng.standard_normal((B, F, M, T)).astype(np.float32))
    key = jax.random.PRNGKey(0)
    g0 = jax.random.uniform(key, (K, B, F, T))
    g0 = g0 / jnp.sum(g0, 0, keepdims=True)
    ones = jnp.ones((K, B, F, T))

    def body_of(fn, **kw):
        def body(carry):
            r, i = carry
            obs_n = norm_observation(r + 1j * i, axis=-2)
            gamma, _ = fn(obs_n, g0, ones, ITERS, **kw)
            return (r * 0.999 + gamma[0][..., None, :] * 1e-6, i)
        return body

    for rep in range(2):
        timed_scan(f"two-pass r04 sweeps=6 [{rep}]",
                   body_of(old.cacgmm_em_pallas), (re, im), audio, iters=8)
        timed_scan(f"single-pass r05 sweeps=6 [{rep}]",
                   body_of(new.cacgmm_em_pallas), (re, im), audio, iters=8)
    timed_scan("two-pass r04 sweeps=3",
               body_of(old.cacgmm_em_pallas, sweeps=3), (re, im), audio,
               iters=8)
    timed_scan("single-pass r05 sweeps=3",
               body_of(new.cacgmm_em_pallas, sweeps=3), (re, im), audio,
               iters=8)


if __name__ == "__main__":
    main()
