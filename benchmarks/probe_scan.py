#!/usr/bin/env python
"""Measure per-lax.scan-step fixed overhead on the axon TPU runtime."""

import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def bench(name, fn, x, inner):
    f = jax.jit(fn)
    y = f(x)
    float(jnp.sum(y))  # force warmup
    t0 = time.perf_counter()
    y = f(y)
    float(jnp.sum(y))
    dt = time.perf_counter() - t0
    print(f"{name:>44}: total {dt*1e3:8.2f} ms  per-step "
          f"{dt*1e3/inner:7.3f} ms", flush=True)


def main():
    for shape in ((8, 128), (256, 1024)):
        x = jnp.ones(shape, jnp.float32)
        for n in (20, 100):
            def scan_fn(x, _n=n):
                def body(c, _):
                    return c * 0.999, ()
                c, _ = jax.lax.scan(body, x, None, length=_n)
                return c

            bench(f"{shape} scan x{n}", scan_fn, x, n)

            def unrolled_fn(x, _n=n):
                for _ in range(_n):
                    x = x * 0.999
                return x

            bench(f"{shape} unrolled x{n}", unrolled_fn, x, n)

            def scan_unroll_fn(x, _n=n):
                def body(c, _):
                    return c * 0.999, ()
                c, _ = jax.lax.scan(body, x, None, length=_n, unroll=True)
                return c

            bench(f"{shape} scan(unroll=True) x{n}", scan_unroll_fn, x, n)

            def fori_fn(x, _n=n):
                return jax.lax.fori_loop(
                    0, _n, lambda i, c: c * 0.999, x)

            bench(f"{shape} fori x{n}", fori_fn, x, n)


if __name__ == "__main__":
    main()
