#!/usr/bin/env python
"""WPD cascade stage budget (VERDICT r03 next #5).

The factored WPD outer iteration = fused WPE step (external lambda) +
CGMM EM (fused kernel) + lambda-weighted MVDR (covariance kernel +
steer + equilibrated solve).  960.6 audio-s/s in r03 compounded the two
known-slow stages, but no budget separated the three fused kernels from
the XLA glue of the outer loop (lambda feedback, mask reshapes).

Chained-prefix rows at the bench shape (B=32 x 4 s, 6 ch, 10 taps,
3 outer, CGMM 10): full WPD, 3x WPE-step-only, 3x CGMM-only, 3x
weighted-MVDR-only (on fixed inputs with a data dependence threaded so
XLA cannot CSE — doc/KERNELS.md round-3 trap).  Reference hot loop:
/root/reference/scripts/sptk/libs/wpe.py:113-177.
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
from setk_tpu.enhance.cluster import cgmm_em
from setk_tpu.enhance.wpe import (_wpd_wpe_step_fused, compute_lambda,
                                  wpd)
from setk_tpu.ops.linalg import (equilibrated_hermitian_solve,
                                 solve_pevd)
from setk_tpu.utils.common import EPSILON

cfg = StftConfig()
SR = 16000
rng = np.random.default_rng(0)
B, N, SECS, TAPS, DELAY = 32, 6, 4, 10, 3
AUDIO = B * SECS


def main():
    w = (rng.standard_normal((B, N, SECS * SR)) * 0.2).astype(np.float32)
    spec = forward_stft(jnp.asarray(w), cfg)
    obs = jnp.transpose(spec, (0, 3, 1, 2))  # (B, F, N, T)
    t = obs.shape[-1]
    obs = jax.device_put(obs)
    o_re = jax.device_put(jnp.real(obs).reshape(-1, N, t))
    o_im = jax.device_put(jnp.imag(obs).reshape(-1, N, t))
    lam0 = jax.device_put(jnp.maximum(
        compute_lambda(obs, context=1), EPSILON))

    probe = probe_overhead_ms()
    print(f"probe overhead: {probe:.2f} ms", flush=True)

    def full_body(c):
        o, s = c
        _, enh = wpd(o, cgmm_iters=10, wpd_iters=3, taps=TAPS,
                     delay=DELAY)
        return (o * 0.9999, s + jnp.mean(jnp.abs(enh)).astype(
            jnp.float32) * 1e-9)

    timed_scan("full WPD (3 outer, CGMM 10)", full_body,
               (obs, jnp.zeros(())), AUDIO, iters=4)

    def wpe_steps_body(c):
        lre, lim, s = c
        lam = lam0.reshape(-1, t)
        acc = s
        for _ in range(3):
            der = _wpd_wpe_step_fused(lre, lim, lam, N, TAPS, DELAY)
            acc = acc + jnp.mean(jnp.abs(der)).astype(jnp.float32) * 1e-9
            lam = jnp.maximum(jnp.abs(der[:, 0]) ** 2, EPSILON)
        return (lre * 0.9999, lim * 0.9999, acc)

    timed_scan("3x fused WPE step (ext lambda)", wpe_steps_body,
               (o_re, o_im, jnp.zeros(())), AUDIO, iters=4)

    def cgmm_body(c):
        o, s = c
        acc = s
        for _ in range(3):
            gamma, _ = cgmm_em(o, 2, num_iters=10, sweeps=3)
            acc = acc + jnp.mean(gamma).astype(jnp.float32) * 1e-9
            o = o * (1.0 + acc * 1e-30)
        return (o * 0.9999, acc)

    timed_scan("3x CGMM EM (10 it, sweeps=3)", cgmm_body,
               (obs, jnp.zeros(())), AUDIO, iters=4)

    mask0 = jax.device_put(jnp.mean(jnp.abs(obs[:, :, 0]), axis=-1,
                                    keepdims=True) * 0 + 0.6)
    mask0 = jnp.broadcast_to(mask0, obs.shape[:2] + (t,))

    def mvdr_body(c):
        o, s = c
        acc = s
        for _ in range(3):
            rd_num, _ = bf.covar_stats(o, 1.0 / lam0)
            rd = rd_num / t
            rs = bf.compute_covar(o, mask0)
            steer = bf.fix_steer_phase(solve_pevd(rs))
            num = equilibrated_hermitian_solve(rd, steer)
            den = jnp.einsum("...d,...d->...", jnp.conj(steer), num)
            weight = num / den[..., None]
            enh = jnp.einsum("...n,...nt->...t", jnp.conj(weight), o)
            acc = acc + jnp.mean(jnp.abs(enh)).astype(jnp.float32) * 1e-9
            o = o * (1.0 + acc * 1e-30)
        return (o * 0.9999, acc)

    timed_scan("3x weighted MVDR stage", mvdr_body,
               (obs, jnp.zeros(())), AUDIO, iters=4)

    def capon_body(c):
        # mirrors the r05 wpd() stage: ONE fused pair-covariance pass
        # for (Rs, Rd) + the fused Capon solve
        from setk_tpu.ops.pallas.mvdr import mvdr_power_pallas
        o, s = c
        acc = s
        for _ in range(3):
            rs, rd = bf.compute_covar_pair(o, mask0, 1.0 / lam0)
            weight = mvdr_power_pallas(rs, rd)
            enh = bf.beamform(weight, o)
            acc = acc + jnp.mean(jnp.abs(enh)).astype(jnp.float32) * 1e-9
            o = o * (1.0 + acc * 1e-30)
        return (o * 0.9999, acc)

    timed_scan("3x fused Capon stage (round-4 path)", capon_body,
               (obs, jnp.zeros(())), AUDIO, iters=4)



if __name__ == "__main__":
    main()
