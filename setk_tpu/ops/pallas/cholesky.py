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

__all__ = ["hermitian_solve_lanes_pallas", "solve_wpe_gram_pallas"]

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


def _gram_solve_kernel(n, k, row0, eps_rel, equilibrate, ar_ref, ai_ref,
                       xr_ref, xi_ref, lr_ref, li_ref, dinv_ref, yr_ref,
                       yi_ref, sc_ref):
    """Planar WPE-gram variant of ``_solve_kernel``.

    The operands are the FULL gram planes straight from the gram kernel
    (column-major (G, G, BINS) f32, exactly Hermitian by in-gram-kernel
    symmetrization): A = gram[row0:row0+n, row0:row0+n] and
    b = gram[row0:row0+n, 0:k] are sliced IN-KERNEL via static offsets,
    so the XLA side never materializes the complex gram, the minor-dim
    corr/cross slices, or a separate rhs — the round trip that cost
    ~15 ms/iteration of the fused WPE step (benchmarks/
    profile_wpe_fused.py, doc/KERNELS.md round-3 budget).

    ``equilibrate`` folds the symmetric Jacobi scaling D A D
    (D = diag^{-1/2}, ops/linalg.equilibrated_hermitian_solve) into the
    column reads — exact math, restores a unit diagonal so the relative
    loading acts per-row (the WPD path's 1/lambda Grams need it).
    """
    rows = slice(row0, row0 + n)
    if equilibrate:
        # sc[j] = rsqrt(diag_j) (1 for empty rows), as an (n, BINS) tile
        for j in range(n):
            dj = ar_ref[row0 + j, row0 + j][None, :]
            sc_ref[j] = jnp.where(dj > 1e-30, jax.lax.rsqrt(
                jnp.maximum(dj, 1e-30)), 1.0)

    def col(j):
        """Scaled Hermitian column j of A: (n, BINS) re/im pair."""
        s_re = ar_ref[row0 + j, rows]
        s_im = ai_ref[row0 + j, rows]
        if equilibrate:
            f = sc_ref[:, 0] * sc_ref[j, 0][None, :]   # (n, BINS)
            s_re = s_re * f
            s_im = s_im * f
        return s_re, s_im

    # ---- diagonal loading: mean of diag(A) (= 1.0 equilibrated) ----
    if equilibrate:
        load = jnp.full((1, ar_ref.shape[-1]), eps_rel, jnp.float32)
    else:
        tr = jnp.zeros((1, ar_ref.shape[-1]), jnp.float32)
        for j in range(n):
            tr += ar_ref[row0 + j, row0 + j][None, :]
        load = (eps_rel / n) * tr + EPSILON

    # ---- left-looking Cholesky ----
    # The rank-update loop is the kernel floor (sum_j j ~ N^2/2
    # iterations, each ~8 VPU ops on (rows, lanes) tiles).  Two cuts:
    #   * FOUR columns per fori iteration (static remainder) quarters
    #     loop control and s read/write traffic;
    #   * lower-triangle row pruning: column j only ever needs rows
    #     >= j, so column j works on the (n - j//8*8, lanes) bottom
    #     row slice (8-aligned per sublane tiling) — the top rows of
    #     later columns are never read (fwd/bwd use L[i, q] with
    #     i > q only).  ~32% off the factorization's vreg count at
    #     n=60 vs a single midpoint split.
    def one_update(q, j, s, row0_s):
        s_re, s_im = s
        ljq_re = lr_ref[q, j][None, :]
        ljq_im = li_ref[q, j][None, :]
        lq_re = lr_ref[q, row0_s:n]
        lq_im = li_ref[q, row0_s:n]
        s_re = s_re - (lq_re * ljq_re + lq_im * ljq_im)
        s_im = s_im - (lq_im * ljq_re - lq_re * ljq_im)
        return (s_re, s_im)

    for j in range(n):
        row0_s = (j // 8) * 8
        s_re, s_im = col(j)
        s_re, s_im = s_re[row0_s:], s_im[row0_s:]

        def quad_update(qq, s, _j=j, _r=row0_s):
            for u in range(4):
                s = one_update(4 * qq + u, _j, s, _r)
            return s

        s_re, s_im = jax.lax.fori_loop(0, j // 4, quad_update,
                                       (s_re, s_im))
        for q in range((j // 4) * 4, j):
            s_re, s_im = one_update(q, j, (s_re, s_im), row0_s)
        d = s_re[j - row0_s][None, :] + load
        inv_d = jax.lax.rsqrt(jnp.maximum(d, EPSILON))
        dinv_ref[j] = inv_d
        lr_ref[j, row0_s:n] = s_re * inv_d
        li_ref[j, row0_s:n] = s_im * inv_d

    # ---- forward substitution: L y = b, b_i = gram[row0+i, 0:k] ----
    def one_fwd(q, i, s):
        s_re, s_im = s
        liq_re = lr_ref[q, i][None, :]
        liq_im = li_ref[q, i][None, :]
        yq_re = yr_ref[q]
        yq_im = yi_ref[q]
        s_re = s_re - (liq_re * yq_re - liq_im * yq_im)
        s_im = s_im - (liq_re * yq_im + liq_im * yq_re)
        return (s_re, s_im)

    for i in range(n):
        s_re = jnp.concatenate([ar_ref[c, row0 + i][None, :]
                                for c in range(k)], axis=0)   # (k, BINS)
        s_im = jnp.concatenate([ai_ref[c, row0 + i][None, :]
                                for c in range(k)], axis=0)
        if equilibrate:
            s_re = s_re * sc_ref[i, 0][None, :]
            s_im = s_im * sc_ref[i, 0][None, :]

        def quad_fwd(qq, s, _i=i):
            for u in range(4):
                s = one_fwd(4 * qq + u, _i, s)
            return s

        s_re, s_im = jax.lax.fori_loop(0, i // 4, quad_fwd, (s_re, s_im))
        for q in range((i // 4) * 4, i):
            s_re, s_im = one_fwd(q, i, (s_re, s_im))
        inv_d = dinv_ref[i]
        yr_ref[i] = s_re * inv_d
        yi_ref[i] = s_im * inv_d

    # ---- backward substitution: L^H x = y (+ unscale) ----
    def one_bwd(q, i, s):
        s_re, s_im = s
        lqi_re = lr_ref[i, q][None, :]
        lqi_im = li_ref[i, q][None, :]
        xq_re = xr_ref[q]
        xq_im = xi_ref[q]
        # the scratch x rows hold the SCALED solution until the final
        # store below
        s_re = s_re - (lqi_re * xq_re + lqi_im * xq_im)
        s_im = s_im - (lqi_re * xq_im - lqi_im * xq_re)
        return (s_re, s_im)

    for i in reversed(range(n)):
        s_re = yr_ref[i]
        s_im = yi_ref[i]
        # unrolled-by-4 over q in [i+1, n): align the fori span to 4
        start = i + 1
        head = min(n, (start + 3) // 4 * 4)
        for q in range(start, head):
            s_re, s_im = one_bwd(q, i, (s_re, s_im))

        def quad_bwd(qq, s, _i=i):
            for u in range(4):
                s = one_bwd(4 * qq + u, _i, s)
            return s

        s_re, s_im = jax.lax.fori_loop(head // 4, n // 4, quad_bwd,
                                       (s_re, s_im))
        # tail rows past the last full quad; [start, head) is already
        # done above (head >= start always), so guard on head — a
        # q >= start guard double-subtracts rows when head clamps to n
        # (n % 4 in {2, 3})
        for q in range((n // 4) * 4, n):
            if q >= head:
                s_re, s_im = one_bwd(q, i, (s_re, s_im))
        inv_d = dinv_ref[i]
        xr_ref[i] = s_re * inv_d
        xi_ref[i] = s_im * inv_d
    if equilibrate:
        for i in range(n):
            xr_ref[i] = xr_ref[i] * sc_ref[i, 0][None, :]
            xi_ref[i] = xi_ref[i] * sc_ref[i, 0][None, :]


def _gram_solve_kernel_nat(n, k, row0, eps_rel, equilibrate,
                           ar_nat, ai_nat, xr_ref, xi_ref,
                           atr, ati, lr_ref, li_ref, dinv_ref,
                           yr_ref, yi_ref, sc_ref):
    """Natural-layout wrapper: the (lanes, G, G) bins-major block is
    relaid to column-major bins-in-lanes IN VMEM, then the standard
    solve body runs on the scratch planes — skipping the XLA
    bins->lanes transpose of the full gram planes in HBM.

    MEASURED NEGATIVE (round 4, kept as documentation): bit-exact vs
    the XLA-transpose path but SLOWER — 8.5/8.3 ms at lanes=256/128 vs
    6.4 ms for XLA-transpose + lanes=512 (the VMEM budget forces
    narrower lanes: inputs + transposed scratch + L at lanes=512
    overflow 128 MB by 6 MB, and Mosaic's lane<->sublane relayout of
    (lanes, 66, 66) blocks costs more than the ~2.7 ms HBM round trip
    it replaces).  Default stays ``in_kernel_relayout=False``."""
    atr[...] = jnp.transpose(ar_nat[...], (2, 1, 0))
    ati[...] = jnp.transpose(ai_nat[...], (2, 1, 0))
    _gram_solve_kernel(n, k, row0, eps_rel, equilibrate, atr, ati,
                       xr_ref, xi_ref, lr_ref, li_ref, dinv_ref,
                       yr_ref, yi_ref, sc_ref)


@partial(jax.jit, static_argnames=("row0", "n", "k", "eps_rel",
                                   "equilibrate", "lanes", "interpret",
                                   "in_kernel_relayout"))
def solve_wpe_gram_pallas(gram_re, gram_im, row0, n, k,
                          eps_rel=1e-6, equilibrate=False,
                          lanes=512, interpret=False,
                          in_kernel_relayout=False):
    """Solve the WPE normal equations straight from planar gram planes.

    gram_re/gram_im (BINS, G, G) f32 as emitted by
    ops/pallas/wpe_gram.wpe_gram_pallas (rows/cols ordered
    [current | taps], Hermitian-symmetrized in-kernel): solves
    corr x = cross with corr = gram[row0:row0+n, row0:row0+n] and
    cross = gram[row0:row0+n, 0:k] (the tap-vs-current block).
    Returns planar (x_re, x_im), each (BINS, n, k) f32.

    ``equilibrate`` + a matching eps_rel replaces
    ops/linalg.equilibrated_hermitian_solve for the WPD path.

    ``lanes`` is the per-grid-step bin batch: the kernel's column
    recursion is a serial chain of tiny (N, lanes) VPU ops, so wider
    tiles amortize the per-op issue cost (the 128-lane form measured
    ~9 ms for 8k 60x60 systems, VPU-issue-bound, not element-bound).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    bins, g, _ = gram_re.shape
    pad = (-bins) % lanes
    scratch = [
        pltpu.VMEM((n, n, lanes), jnp.float32),  # L re
        pltpu.VMEM((n, n, lanes), jnp.float32),  # L im
        pltpu.VMEM((n, 1, lanes), jnp.float32),  # 1/diag
        pltpu.VMEM((n, k, lanes), jnp.float32),  # y re
        pltpu.VMEM((n, k, lanes), jnp.float32),  # y im
        pltpu.VMEM((n, 1, lanes), jnp.float32),  # equilibration scales
    ]
    x_spec = pl.BlockSpec((n, k, lanes), lambda i: (0, 0, i),
                          memory_space=pltpu.VMEM)
    if in_kernel_relayout:
        # bins-major planes go straight in; the bins->lanes relayout
        # happens in VMEM (see _gram_solve_kernel_nat)
        a_r, a_i = gram_re, gram_im
        if pad:
            a_r = jnp.pad(a_r, ((0, pad), (0, 0), (0, 0)))
            a_i = jnp.pad(a_i, ((0, pad), (0, 0), (0, 0)))
        binsp = a_r.shape[0]
        nb = binsp // lanes
        a_spec = pl.BlockSpec((lanes, g, g), lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM)
        kernel = partial(_gram_solve_kernel_nat, n, k, row0, eps_rel,
                         equilibrate)
        scratch = [pltpu.VMEM((g, g, lanes), jnp.float32)] * 2 + scratch
    else:
        # column-major with bins in lanes: at[c, r] = gram[r, c]
        a_r = jnp.transpose(gram_re, (2, 1, 0))
        a_i = jnp.transpose(gram_im, (2, 1, 0))
        if pad:
            a_r = jnp.pad(a_r, ((0, 0), (0, 0), (0, pad)))
            a_i = jnp.pad(a_i, ((0, 0), (0, 0), (0, pad)))
        binsp = a_r.shape[-1]
        nb = binsp // lanes
        a_spec = pl.BlockSpec((g, g, lanes), lambda i: (0, 0, i),
                              memory_space=pltpu.VMEM)
        kernel = partial(_gram_solve_kernel, n, k, row0, eps_rel,
                         equilibrate)
    out_shape = jax.ShapeDtypeStruct((n, k, binsp), jnp.float32)
    xr, xi = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[a_spec, a_spec],
        out_specs=[x_spec, x_spec],
        out_shape=[out_shape, out_shape],
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(a_r, a_i)
    # (n, k, binsp) -> (BINS, n, k); the transpose is tiny (nk x N)
    return (jnp.transpose(xr[..., :bins], (2, 0, 1)),
            jnp.transpose(xi[..., :bins], (2, 0, 1)))


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
