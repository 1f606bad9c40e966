"""Shared scan-chained timing for the TPU benchmarks.

Methodology (see bench.py): the remote runtime's async dispatch makes
block_until_ready unreliable and each Python-dispatched call carries a
fixed ~2.5 ms, so iterations are chained *inside one lax.scan program*
(each step's carry consumes the previous step's output) and the chain
is forced by one scalar fetch; compile time is excluded by timing the
second call.
"""

import time

import jax
import jax.numpy as jnp

__all__ = ["timed_scan", "probe_overhead_ms"]


def probe_overhead_ms(iters=40):
    """Fixed per-dispatch overhead of the remote runtime, measured with
    a trivial chained scan (an (8, 128) carry times 0.999 per step —
    compute is ~0, so the chain's total wall time IS the fixed cost).

    The tunnel's overhead varies with load (~2.5 ms measured 2026-08-17,
    ~25 ms on 2026-08-19); committing this number alongside each bench
    artifact keeps round-over-round throughput rows comparable
    (VERDICT round-2 weak #6).  Returns total milliseconds for one
    chained dispatch.
    """
    x = jnp.ones((8, 128), jnp.float32)

    @jax.jit
    def run(c):
        def f(c, _):
            return c * 0.999, ()

        c, _ = jax.lax.scan(f, c, None, length=iters)
        return c

    c = run(x)
    float(jnp.sum(c))
    best = float("inf")
    for _ in range(2):  # min-of-2: stalls only ADD time
        t0 = time.perf_counter()
        c = run(c)
        float(jnp.sum(c))
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


def timed_scan(name, body, init_carry, audio_s, iters=6, repeats=2):
    """body(carry) -> carry, chained ``iters`` times inside one jit.

    Takes the MIN of ``repeats`` timed chains: the tunnel's transient
    stalls only ADD time, so the min is the stall-resistant estimator
    (one 20 ms hiccup polluted a single-chain row 4x in round 4 —
    bench_latency.py learned this first; every artifact row now uses
    it).  Prints per-step latency and audio-seconds/s; returns the
    rate.
    """

    @jax.jit
    def run(c):
        def f(c, _):
            return body(c), ()

        c, _ = jax.lax.scan(f, c, None, length=iters)
        return c

    first = lambda c: c[0] if isinstance(c, tuple) else c
    c = run(init_carry)
    float(jnp.sum(jnp.abs(first(c))))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        c = run(c)
        float(jnp.sum(jnp.abs(first(c))))
        best = min(best, time.perf_counter() - t0)
    dt = best / iters
    rate = audio_s / dt
    print(f"{name:>40}: {dt*1e3:8.2f} ms/step  ({rate:9.0f} audio-s/s)",
          flush=True)
    return rate
