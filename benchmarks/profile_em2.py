#!/usr/bin/env python
"""Time the fused CACGMM EM kernel vs the XLA scan on the chip.

NOTE: the remote runtime's fixed per-call overhead measured ~25 ms on
2026-08-19 (vs the ~2.5 ms noted earlier) — chain >= 10 EM calls per
program so the per-call number stays meaningful.
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
from setk_tpu.enhance.cluster import cacgmm_em

cfg = StftConfig()
SR = 16000
rng = np.random.default_rng(0)


def make_obs(b, secs=4):
    we = (rng.standard_normal((b, 6, secs * SR)) * 0.2).astype(np.float32)
    spec = forward_stft(jnp.asarray(we), cfg)
    return jax.device_put(jnp.transpose(spec, (0, 3, 1, 2)))  # (B,F,M,T)


def em_rate(name, obs, audio_s, fused):
    def em_body(o):
        gamma, _ = cacgmm_em(o, 2, num_iters=20, use_fused=fused)
        return o * 0.9999 + jnp.mean(gamma).astype(o.dtype) * 1e-9

    return timed_scan(name, em_body, obs, audio_s, iters=10)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "fused"
    for b in (8, 32):
        obs = make_obs(b)
        if which in ("fused", "both"):
            em_rate(f"CACGMM 20it B={b} fused", obs, b * 4, True)
        if which in ("xla", "both"):
            em_rate(f"CACGMM 20it B={b} xla", obs, b * 4, False)


if __name__ == "__main__":
    main()
