#!/usr/bin/env python
"""Mask-estimator training throughput on the chip.

The reference delegates mask training to Kaldi nnet3 CPU recipes
(steps/train_dnn_mask.sh); here the native flax/optax trainer runs the
same family (DNN / BLSTM, sigmoid mask head, quadratic objective).
Measures optimizer steps/s and audio-seconds/s of training throughput
(B x T frames per step, hop 16 ms) with steps chained inside one
lax.scan program (see _timing.py for why).

Run: python benchmarks/bench_training.py    (real TPU)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from setk_tpu.models.mask_net import make_model, quadratic_loss

B, T, F = 64, 400, 257
HOP_S = 0.016
STEPS = 8


def bench(arch, hidden=512, num_layers=3):
    model = make_model(arch=arch, num_bins=F, hidden=hidden,
                       num_layers=num_layers)
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.standard_normal((B, T, F)).astype(np.float32))
    targets = jnp.asarray(rng.random((B, T, F)).astype(np.float32))
    fmask = jnp.ones((B, T), jnp.float32)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 8, F)))["params"]
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def run(params, opt_state):
        def step(carry, _):
            params, opt_state = carry

            def loss_fn(p):
                pred = model.apply({"params": p}, feats)
                return quadratic_loss(pred, targets, fmask)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(
            step, (params, opt_state), None, length=STEPS)
        return params, opt_state, losses

    p, o, losses = run(params, opt_state)
    # NOTE: block_until_ready does not synchronize on the axon remote
    # runtime — warm up with a real value fetch or the timed call
    # absorbs the warmup's execution
    float(jnp.sum(losses))
    t0 = time.perf_counter()
    p, o, losses = run(p, o)
    float(jnp.sum(losses))
    dt = (time.perf_counter() - t0) / STEPS
    audio_s = B * T * HOP_S
    print(f"{arch:>8} (h={hidden}, L={num_layers}): {dt*1e3:7.2f} ms/step"
          f"  ({1.0/dt:6.1f} steps/s, {audio_s/dt:9.0f} audio-s/s)",
          flush=True)
    return {"ms_per_step": round(dt * 1e3, 2),
            "steps_per_s": round(1.0 / dt, 1),
            "audio_s_per_s": round(audio_s / dt, 1)}


def main():
    rows = {arch: bench(arch) for arch in ("dnn", "blstm")}
    from _timing import probe_overhead_ms
    probe = probe_overhead_ms()
    print(f"probe: fixed chained-dispatch overhead {probe:.2f} ms",
          flush=True)
    if len(sys.argv) > 1:  # optional JSON artifact path (per-round)
        import json
        with open(sys.argv[1], "w") as fd:
            json.dump({"shape": {"B": B, "T": T, "F": F}, "rows": rows,
                       "probe_overhead_ms": round(probe, 2)}, fd,
                      indent=1)


if __name__ == "__main__":
    main()
