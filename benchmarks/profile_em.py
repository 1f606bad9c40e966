#!/usr/bin/env python
"""Localize the CACGMM EM batch-scaling cliff (VERDICT round-1 item 1).

Round-1 recorded "EM at B=32 costs ~5.4x the B=8 step" without an
explanation.  This script measures, all with scan-chained timing:

  * the 20-iteration CACGMM step at B = 8 / 16 / 32 (scaling curve);
  * the same with each suspect component swapped for its alternative
    (Pallas Jacobi inverse <-> XLA eigh; Pallas covar <-> VPU pair
    loop <-> einsum);
  * isolated per-stage scans (covar / inverse / quad / posterior) at
    both batch sizes.

Run on the real chip: python benchmarks/profile_em.py
"""

import os
import sys
from functools import partial

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from _timing import timed_scan
from setk_tpu.dsp.stft import StftConfig, forward_stft
import setk_tpu.enhance.cluster as cluster
import setk_tpu.enhance.beamformer as bf
from setk_tpu.ops.linalg import regularized_inverse

cfg = StftConfig()
SR = 16000
rng = np.random.default_rng(0)


def make_obs(b, secs=4):
    we = (rng.standard_normal((b, 6, secs * SR)) * 0.2).astype(np.float32)
    spec = forward_stft(jnp.asarray(we), cfg)
    return jax.device_put(jnp.transpose(spec, (0, 3, 1, 2)))  # (B,F,M,T)


def em_rate(name, obs, audio_s):
    def em_body(o):
        gamma, _ = cluster.cacgmm_em(o, 2, num_iters=20)
        return o * 0.9999 + jnp.mean(gamma).astype(o.dtype) * 1e-9

    return timed_scan(name, em_body, obs, audio_s, iters=3)


def main():
    obs8, obs32 = make_obs(8), make_obs(32)

    print("== component swaps ==")
    orig_ri = cluster.regularized_inverse
    orig_wc = cluster._weighted_covar

    # plain einsum covar
    def wc_einsum(obs, weight):
        return jnp.einsum("k...nt,...mt->k...nm",
                          weight[..., None, :] * obs[None], jnp.conj(obs))

    cluster._weighted_covar = wc_einsum
    em_rate("B=8  einsum-covar", obs8, 8 * 4)
    em_rate("B=32 einsum-covar", obs32, 32 * 4)
    cluster._weighted_covar = orig_wc

    print("== isolated stages (20 chained reps each) ==")
    for b, obs in ((8, obs8), (32, obs32)):
        t = obs.shape[-1]

        @jax.jit
        def setup(obs):
            o = cluster.norm_observation(obs, axis=-2)
            gamma = jnp.ones((2, b, cfg.num_bins, t)) * 0.5
            covar = 6 * cluster._weighted_covar(o, gamma) / t
            return o, gamma, covar

        o, gamma, covar = setup(obs)

        # complex arrays ride the carry: a closure-captured device array
        # becomes a jit constant, which axon cannot fetch (complex D2H)
        def cov_body(c):
            g, oo = c
            num = cluster._weighted_covar(oo, g)
            return (g * 0.9999 +
                    jnp.mean(jnp.abs(num)).astype(g.dtype) * 1e-12, oo)

        timed_scan(f"B={b} stage covar", cov_body, (gamma, o), b * 4,
                   iters=20)

        def inv_body(cv):
            inv, ld = cluster.regularized_inverse(cv, return_logdet=True)
            return cv * 0.9999 + jnp.mean(jnp.abs(inv)).astype(cv.dtype) * 1e-12

        timed_scan(f"B={b} stage inverse", inv_body, covar, b * 4, iters=20)

        def quad_body(c):
            oo, ri = c
            q = cluster._cgmm_quad(oo, ri)
            return (oo * 0.9999 + jnp.mean(q).astype(oo.dtype) * 1e-12, ri)

        r_inv = jax.jit(cluster.regularized_inverse)(covar)
        timed_scan(f"B={b} stage quad", quad_body, (o, r_inv), b * 4,
                   iters=20)

        log_pdf = jnp.zeros((2, b, cfg.num_bins, t))
        alpha = jnp.full((2, b, cfg.num_bins), 0.5)

        def post_body(lp):
            g, q = cluster._posterior(lp, alpha)
            return lp * 0.9999 + (g[0] * 1e-12)

        timed_scan(f"B={b} stage posterior", post_body, log_pdf, b * 4,
                   iters=20)


if __name__ == "__main__":
    main()
