#!/usr/bin/env python
"""Same-process CGMM INIT head-to-head: the r04 einsum init (sample
covariance einsum at GRAM_PRECISION + TWO regularized inverses + einsum
quad) vs the r05 routed init (pair-loop/Pallas covariance + ONE shared
inverse + unrolled pair quad).  B=32 x 4 s, F=257, M=6, T=251."""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))


def main():
    import jax
    import jax.numpy as jnp
    from _timing import probe_overhead_ms, timed_scan
    from setk_tpu.enhance.cluster import (_cgmm_predict, _cgmm_quad,
                                          _quad_pairs, _weighted_covar)
    from setk_tpu.ops.linalg import regularized_inverse
    from setk_tpu.utils.common import GRAM_PRECISION

    rng = np.random.default_rng(0)
    B, F, M, T, K = 32, 257, 6, 251, 2
    probe = probe_overhead_ms()
    print(f"probe: {probe:.2f} ms", flush=True)
    audio = B * 4

    re = jnp.asarray(rng.standard_normal((B, F, M, T)).astype(np.float32))
    im = jnp.asarray(rng.standard_normal((B, F, M, T)).astype(np.float32))
    eye = np.eye(M, dtype=np.complex64)

    def init_old(obs):
        rs = jnp.einsum("...xt,...yt->...xy", obs, jnp.conj(obs),
                        precision=GRAM_PRECISION) / T
        rn = jnp.broadcast_to(jnp.asarray(eye), rs.shape)
        covar = jnp.stack([rs, rn])
        r_inv = regularized_inverse(covar)
        phi = _cgmm_quad(obs, r_inv) / M
        alpha = jnp.full((K, B, F), 1.0 / K)
        gamma, _ = _cgmm_predict(obs, phi, covar, alpha)
        return gamma

    def init_new(obs):
        rs = _weighted_covar(obs, jnp.ones((1, B, F, T)))[0] / T
        rn = jnp.broadcast_to(jnp.asarray(eye), rs.shape)
        covar = jnp.stack([rs, rn])
        r_inv, logdet = regularized_inverse(covar, return_logdet=True)
        phi = _quad_pairs(obs, r_inv) / M
        alpha = jnp.full((K, B, F), 1.0 / K)
        gamma, _ = _cgmm_predict(obs, phi, covar, alpha, logdet=logdet)
        return gamma

    def body_of(fn):
        def body(carry):
            r, i = carry
            gamma = fn(r + 1j * i)
            return (r * 0.999 + gamma[0][..., None, :] * 1e-6, i)
        return body

    for rep in range(2):
        timed_scan(f"init OLD (einsum, 2x inverse) [{rep}]",
                   body_of(init_old), (re, im), audio, iters=12)
        timed_scan(f"init NEW (routed, shared inv) [{rep}]",
                   body_of(init_new), (re, im), audio, iters=12)


if __name__ == "__main__":
    main()
