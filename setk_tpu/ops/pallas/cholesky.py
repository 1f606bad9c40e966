"""Pallas TPU kernel: lane-batched Hermitian solve for medium systems.

XLA's batched complex Cholesky collapses at WPE's problem shape — 8k
independent (60, 60) Hermitian systems solve in ~170 ms (~20 GFLOP/s),
85% of the whole WPE iteration (the real-augmented 120x120 and LU forms
measured worse).  This kernel assigns each frequency bin to a lane and
runs ONE left-looking Cholesky whose column operations are (N, 128)
vector ops over 128 bins at once — the per-bin LAPACK recursion becomes
a lane-parallel program, the same transformation the 6x6 MVDR kernel
(ops/pallas/mvdr.py) applies statically, but with ``fori_loop`` inner
accumulations and dynamic dim-0 indexing so the IR stays O(N), not
O(N^3), and N up to ~128 compiles quickly.

Layouts (bins last, always 128-lane tiles; leading dims are dynamically
indexable):
    A   (N, N, BINS)   column-major: a_ref[c] is column c, an (N, 128)
                       tile per grid step
    rhs (N, K, BINS)   row r is a (K, 128) tile
    out (N, K, BINS)

Reference: the per-bin np.linalg solves of
/root/reference/scripts/sptk/libs/wpe.py:58-77 (R = y~ L^-1 y~^H taps
correlation, G = solve(R, r)).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from setk_tpu.utils.common import EPSILON

__all__ = ["hermitian_solve_lanes_pallas"]

_LANES = 128


def _solve_kernel(n, k, eps_rel, ar_ref, ai_ref, br_ref, bi_ref, xr_ref,
                  xi_ref, lr_ref, li_ref, dinv_ref, yr_ref, yi_ref):
    # ---- scale-invariant diagonal loading: mean of diag(A) ----
    tr = jnp.zeros((1, ar_ref.shape[-1]), jnp.float32)
    for j in range(n):
        tr += ar_ref[j, j][None, :]
    load = (eps_rel / n) * tr + EPSILON  # (1, BINS)

    # ---- left-looking Cholesky, column at a time ----
    for j in range(n):
        # s = A[:, j] (hermitianized on the fly: use column j of the
        # lower triangle as stored; A is Hermitian by construction)
        s_re = ar_ref[j]  # (N, BINS): column j
        s_im = ai_ref[j]

        def col_update(q, s):
            s_re, s_im = s
            ljq_re = lr_ref[q, j][None, :]   # conj(L[j, q]) scalar row
            ljq_im = li_ref[q, j][None, :]
            lq_re = lr_ref[q]                # (N, BINS) column q
            lq_im = li_ref[q]
            # s -= L[:, q] * conj(L[j, q])
            s_re = s_re - (lq_re * ljq_re + lq_im * ljq_im)
            s_im = s_im - (lq_im * ljq_re - lq_re * ljq_im)
            return (s_re, s_im)

        s_re, s_im = jax.lax.fori_loop(0, j, col_update, (s_re, s_im))
        d = s_re[j][None, :] + load
        inv_d = jax.lax.rsqrt(jnp.maximum(d, EPSILON))
        dinv_ref[j] = inv_d
        lr_ref[j] = s_re * inv_d
        li_ref[j] = s_im * inv_d

    # ---- forward substitution: L y = b ----
    for i in range(n):
        s_re = br_ref[i]  # (K, BINS)
        s_im = bi_ref[i]

        def fwd_update(q, s):
            s_re, s_im = s
            liq_re = lr_ref[q, i][None, :]   # L[i, q]
            liq_im = li_ref[q, i][None, :]
            yq_re = yr_ref[q]
            yq_im = yi_ref[q]
            s_re = s_re - (liq_re * yq_re - liq_im * yq_im)
            s_im = s_im - (liq_re * yq_im + liq_im * yq_re)
            return (s_re, s_im)

        s_re, s_im = jax.lax.fori_loop(0, i, fwd_update, (s_re, s_im))
        inv_d = dinv_ref[i]
        yr_ref[i] = s_re * inv_d
        yi_ref[i] = s_im * inv_d

    # ---- backward substitution: L^H x = y ----
    for i in reversed(range(n)):
        s_re = yr_ref[i]
        s_im = yi_ref[i]

        def bwd_update(q, s):
            s_re, s_im = s
            # conj(L[q, i]) with L[q, i] = (col i, row q)
            lqi_re = lr_ref[i, q][None, :]
            lqi_im = li_ref[i, q][None, :]
            xq_re = xr_ref[q]
            xq_im = xi_ref[q]
            s_re = s_re - (lqi_re * xq_re + lqi_im * xq_im)
            s_im = s_im - (lqi_re * xq_im - lqi_im * xq_re)
            return (s_re, s_im)

        s_re, s_im = jax.lax.fori_loop(i + 1, n, bwd_update, (s_re, s_im))
        inv_d = dinv_ref[i]
        xr_ref[i] = s_re * inv_d
        xi_ref[i] = s_im * inv_d


@partial(jax.jit, static_argnames=("eps_rel", "interpret"))
def _solve_lanes(ar, ai, br, bi, eps_rel, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    n, _, bins = ar.shape
    k = br.shape[1]
    nb = bins // _LANES
    a_spec = pl.BlockSpec((n, n, _LANES), lambda i: (0, 0, i),
                          memory_space=pltpu.VMEM)
    b_spec = pl.BlockSpec((n, k, _LANES), lambda i: (0, 0, i),
                          memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((n, k, bins), jnp.float32)
    scratch = [
        pltpu.VMEM((n, n, _LANES), jnp.float32),  # L re
        pltpu.VMEM((n, n, _LANES), jnp.float32),  # L im
        pltpu.VMEM((n, 1, _LANES), jnp.float32),  # 1/diag
        pltpu.VMEM((n, k, _LANES), jnp.float32),  # y re
        pltpu.VMEM((n, k, _LANES), jnp.float32),  # y im
    ]
    return pl.pallas_call(
        partial(_solve_kernel, n, k, eps_rel),
        grid=(nb,),
        in_specs=[a_spec, a_spec, b_spec, b_spec],
        out_specs=[b_spec, b_spec],
        out_shape=[out_shape, out_shape],
        scratch_shapes=scratch,
        interpret=interpret,
    )(ar, ai, br, bi)


def hermitian_solve_lanes_pallas(a: jax.Array,
                                 b: jax.Array,
                                 eps_rel: float = 1e-6,
                                 assume_hermitian: bool = False,
                                 interpret: bool = False) -> jax.Array:
    """Solve a x = b for batched Hermitian-PD ``a``.

    a (..., N, N) complex, b (..., N, K); any leading batch shape (the
    batch becomes the lane axis).  Numerically matches
    ops.linalg.hermitian_solve (same hermitianize + scale-invariant
    diagonal loading).  Intended for medium N (~16..128) where XLA's
    batched complex Cholesky collapses; small N (<= 8) should use the
    statically-unrolled forms instead.

    ``assume_hermitian`` skips the 0.5 (A + A^H) pass — use when A is an
    exact Gram matrix (x W x^H with one rounding per entry); the kernel
    consumes whole stored columns, so sub-ulp asymmetry is harmless and
    the skip saves a full read+write of A.
    """
    *lead, nn, _ = a.shape
    k = b.shape[-1]
    bf = int(np.prod(lead)) if lead else 1
    ah = a if assume_hermitian else \
        0.5 * (a + jnp.conj(jnp.swapaxes(a, -1, -2)))
    # column-major planar with bins in lanes: (col, row, BF) in one
    # transpose (XLA fuses it into the real/imag split consumers)
    at = jnp.transpose(ah.reshape(bf, nn, nn), (2, 1, 0))
    bt = jnp.moveaxis(b.reshape(bf, nn, k), 0, -1)     # (N, K, BF)
    pad = (-bf) % _LANES
    if pad:
        at = jnp.pad(at, ((0, 0), (0, 0), (0, pad)))
        bt = jnp.pad(bt, ((0, 0), (0, 0), (0, pad)))
    xr, xi = _solve_lanes(
        jnp.real(at).astype(jnp.float32), jnp.imag(at).astype(jnp.float32),
        jnp.real(bt).astype(jnp.float32), jnp.imag(bt).astype(jnp.float32),
        eps_rel=eps_rel, interpret=interpret)
    x = (xr + 1j * xi)[..., :bf]                       # (N, K, BF)
    return jnp.moveaxis(x, -1, 0).reshape(*lead, nn, k).astype(a.dtype)
