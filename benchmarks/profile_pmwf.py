#!/usr/bin/env python
"""PMWF stage attribution (VERDICT r2 weak #4): is the 1.6x gap vs the
sibling beamformers the N-column in-kernel Cholesky solve, or the XLA
SNR reference-channel selection einsums?

Chained timing at the bench shape (B=128 x 8 s, fused pair covariance
feeding the solves, like the real pipeline).
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
from setk_tpu.enhance import beamformer as bf
from setk_tpu.ops.pallas.mvdr import (gevd_power_pallas, mvdr_power_pallas,
                                      pmwf_solve_pallas)
from setk_tpu.parallel.enhance_step import enhance_batch

cfg = StftConfig()
SR = 16000
rng = np.random.default_rng(0)
B, N, SECS = 128, 6, 8
AUDIO = B * SECS


def main():
    wav = jax.device_put(
        (rng.standard_normal((B, N, SECS * SR)) * 3000).astype(np.int16))
    t_frames = cfg.num_frames(SECS * SR)
    mask = jax.device_put(
        rng.random((B, t_frames, cfg.num_bins)).astype(np.float32))
    probe = probe_overhead_ms()
    print(f"probe overhead: {probe:.2f} ms", flush=True)

    # end-to-end rows for context
    for name in ("mvdr", "gevd", "pmwf-0"):

        def body(m, _n=name):
            out = enhance_batch(wav, m, cfg, beamformer=_n)
            return m * 0.999 + jnp.mean(out)[None, None, None] * 1e-9

        timed_scan(f"enhance {name}", body, mask, AUDIO, iters=12)

    # isolated weight stages on the same covariances
    spec = forward_stft(wav, cfg)
    obs = jnp.transpose(spec, (0, 3, 1, 2))
    mask_ft = jnp.swapaxes(mask, -1, -2)
    rs, rn = bf.compute_covar_pair(obs, mask_ft)
    rs, rn = jax.device_put(rs), jax.device_put(rn)

    def wsolve_body(c):
        a, b_, s = c
        wm = pmwf_solve_pallas(a, b_, beta=0.0)
        return (a * 0.9999, b_ * 0.9999, s + jnp.mean(jnp.abs(wm)) * 1e-12)

    timed_scan("pmwf solve only", wsolve_body, (rs, rn, jnp.zeros(())),
               AUDIO, iters=12)

    def wsel_body(c):
        a, b_, s = c
        wm = pmwf_solve_pallas(a, b_, beta=0.0)
        wt = bf.pmwf_select_ref(wm, a, b_)
        return (a * 0.9999, b_ * 0.9999, s + jnp.mean(jnp.abs(wt)) * 1e-12)

    timed_scan("pmwf solve+select", wsel_body, (rs, rn, jnp.zeros(())),
               AUDIO, iters=12)

    def mvdr_body(c):
        a, b_, s = c
        wt = mvdr_power_pallas(a, b_)
        return (a * 0.9999, b_ * 0.9999, s + jnp.mean(jnp.abs(wt)) * 1e-12)

    timed_scan("mvdr solve (ref)", mvdr_body, (rs, rn, jnp.zeros(())),
               AUDIO, iters=12)

    def gevd_body(c):
        a, b_, s = c
        wt = gevd_power_pallas(a, b_, power_iters=30)
        return (a * 0.9999, b_ * 0.9999, s + jnp.mean(jnp.abs(wt)) * 1e-12)

    timed_scan("gevd solve (ref)", gevd_body, (rs, rn, jnp.zeros(())),
               AUDIO, iters=12)


if __name__ == "__main__":
    main()
