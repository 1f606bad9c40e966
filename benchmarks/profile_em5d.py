#!/usr/bin/env python
"""CGMM init component sweep: covar {einsum, routed} x quad {einsum,
pairs} x inverse {double, shared}, same process, B=32 x 4 s."""

import itertools
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

    def init(obs, covar_kind, quad_kind, shared):
        if covar_kind == "einsum":
            rs = jnp.einsum("...xt,...yt->...xy", obs, jnp.conj(obs),
                            precision=GRAM_PRECISION) / T
        else:
            rs = _weighted_covar(obs, jnp.ones((1, B, F, T)))[0] / T
        rn = jnp.broadcast_to(jnp.asarray(eye), rs.shape)
        covar = jnp.stack([rs, rn])
        if shared:
            r_inv, logdet = regularized_inverse(covar, return_logdet=True)
        else:
            r_inv, logdet = regularized_inverse(covar), None
        qf = _cgmm_quad if quad_kind == "einsum" else _quad_pairs
        phi = qf(obs, r_inv) / M
        alpha = jnp.full((K, B, F), 1.0 / K)
        gamma, _ = _cgmm_predict(obs, phi, covar, alpha, logdet=logdet)
        return gamma

    for ck, qk, sh in itertools.product(("einsum", "routed"),
                                        ("einsum", "pairs"),
                                        (False, True)):
        def body(carry, _ck=ck, _qk=qk, _sh=sh):
            r, i = carry
            gamma = init(r + 1j * i, _ck, _qk, _sh)
            return (r * 0.999 + gamma[0][..., None, :] * 1e-6, i)

        timed_scan(f"covar={ck:6s} quad={qk:6s} shared={int(sh)}",
                   body, (re, im), audio, iters=12)


if __name__ == "__main__":
    main()
