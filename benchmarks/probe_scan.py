#!/usr/bin/env python
"""Measure per-lax.scan-step fixed overhead on the axon TPU runtime.

Context: isolated EM stage scans measured a ~1.1 ms floor per scan step
regardless of data size (benchmarks/profile_em.py) — if lax.scan steps
carry a fixed per-step cost on this runtime, unrolling the EM loop
removes it.
"""

import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def bench(name, fn, x, inner):
    f = jax.jit(fn)
    y = f(x)
    float(jnp.sum(y))  # force warmup
    t0 = time.perf_counter()
    y = f(y)
    float(jnp.sum(y))
    dt = time.perf_counter() - t0
    print(f"{name:>34}: total {dt*1e3:8.2f} ms  per-step "
          f"{dt*1e3/inner:7.3f} ms", flush=True)


def main():
    x = jnp.ones((8, 128), jnp.float32)
    n = 40

    def scan_fn(x):
        def body(c, _):
            return c * 0.999, ()
        c, _ = jax.lax.scan(body, x, None, length=n)
        return c

    def unrolled_fn(x):
        for _ in range(n):
            x = x * 0.999
        return x

    def scan_q(x):
        # scan that also stacks a per-step scalar (like the EM Q history)
        def body(c, _):
            c = c * 0.999
            return c, jnp.mean(c)
        c, q = jax.lax.scan(body, x, None, length=n)
        return c + q[-1]

    bench(f"(8,128) scan x{n}", scan_fn, x, n)
    bench(f"(8,128) unrolled x{n}", unrolled_fn, x, n)
    bench(f"(8,128) scan+qhist x{n}", scan_q, x, n)


if __name__ == "__main__":
    main()
