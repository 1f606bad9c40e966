#!/usr/bin/env python
"""Round-5 EM attribution: (a) the restructured single-pass kernel vs
the round-4 two-pass numbers, (b) the CGMM-vs-CACGMM gap (verdict weak
#7: 5,703 vs 6,942 audio-s/s on the same kernel), (c) the WPD
inner-CGMM stage vs its component floor (weak #2).

Hypothesis for (b)/(c): the CGMM entry path runs an XLA init per call —
sample covariance einsum at full T, regularized_inverse (eigh), quad,
predict (enhance/cluster.py:148-172) — which the CACGMM random init
does not pay; WPD pays it every outer iteration.  Levels timed:

  L1 kernel-only      cgmm_em_pallas / cacgmm_em_pallas with
                      precomputed init planes (layout + kernel)
  L2 full entry       cluster.cgmm_em / cacgmm_em fresh call
                      (init + layout + kernel)

min-of-2 chained scans, probe subtracted.  Shapes: B=32 x 4 s, F=257,
M=6, T=251, K=2.
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

SR = 16000


def main():
    import jax
    import jax.numpy as jnp
    from _timing import probe_overhead_ms, timed_scan
    from setk_tpu.enhance.cluster import cacgmm_em, cgmm_em, norm_observation
    from setk_tpu.ops.pallas.cacgmm_em import (cacgmm_em_pallas,
                                               cgmm_em_pallas)

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

    # ---- L2 full entries ---------------------------------------------
    def cacgmm_body(carry):
        r, i = carry
        gamma, _ = cacgmm_em(r + 1j * i, K, num_iters=ITERS)
        return (r * 0.999 + gamma[0][..., None, :] * 1e-6, i)

    timed_scan(f"L2 cacgmm_em full ({ITERS} it)", cacgmm_body, (re, im),
               audio, iters=8)

    def cgmm_body(carry):
        r, i = carry
        gamma, _ = cgmm_em(r + 1j * i, K, num_iters=ITERS)
        return (r * 0.999 + gamma[0][..., None, :] * 1e-6, i)

    timed_scan(f"L2 cgmm_em full ({ITERS} it)", cgmm_body, (re, im),
               audio, iters=8)

    # ---- L1 kernel+layout with fixed init planes ---------------------
    def l1_cacg(carry):
        r, i = carry
        obs_n = norm_observation(r + 1j * i, axis=-2)
        gamma, _ = cacgmm_em_pallas(obs_n, g0, ones, ITERS)
        return (r * 0.999 + gamma[0][..., None, :] * 1e-6, i)

    timed_scan(f"L1 cacgmm kernel+layout ({ITERS} it)", l1_cacg, (re, im),
               audio, iters=8)

    def l1_cg(carry):
        r, i = carry
        gamma, _ = cgmm_em_pallas(r + 1j * i, g0, ones, ITERS)
        return (r * 0.999 + gamma[0][..., None, :] * 1e-6, i)

    timed_scan(f"L1 cgmm kernel+layout ({ITERS} it)", l1_cg, (re, im),
               audio, iters=8)

    # ---- WPD inner regime: 10 iters, sweeps=3 ------------------------
    def wpd_inner(carry):
        r, i = carry
        gamma, _ = cgmm_em(r + 1j * i, K, num_iters=10, sweeps=3)
        return (r * 0.999 + gamma[0][..., None, :] * 1e-6, i)

    timed_scan("WPD-inner cgmm_em (10 it, sweeps=3)", wpd_inner, (re, im),
               audio, iters=8)

    # sweeps sensitivity of the restructured kernel
    for sw in (3, 6):
        def body(carry, _sw=sw):
            r, i = carry
            obs_n = norm_observation(r + 1j * i, axis=-2)
            gamma, _ = cacgmm_em_pallas(obs_n, g0, ones, ITERS, sweeps=_sw)
            return (r * 0.999 + gamma[0][..., None, :] * 1e-6, i)

        timed_scan(f"L1 cacgmm sweeps={sw} ({ITERS} it)", body, (re, im),
                   audio, iters=8)

    # (a chunked single-pass restructure was swept here in r05 and
    # REVERTED: same-process compare profile_em5b.py — doc/KERNELS.md)


if __name__ == "__main__":
    main()
