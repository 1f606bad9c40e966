"""Pallas TPU kernel: fused MVDR weight solve (steer + Capon) per bin.

The MVDR stage is the largest piece of the enhancement step (22.5 ms of
the 60 ms bench step): XLA lowers the batched (B*F, N, N) cholesky +
triangular_solve pair as general small-matrix library calls at tiny
occupancy.  Statically unrolling the solve *in XLA* was measured ~27%
slower (ops/linalg._unrolled_cholesky_solve — the scalarized graph
defeats cross-stage fusion), but inside one Pallas kernel the unrolled
recurrences become pure VPU code over a (rows, 128)-bin tile with every
intermediate in registers/VMEM.

Layout: entry-major planar complex.  The caller reshapes (BF, N, N) to
(N*N, BF) so each matrix entry (i, j) is a contiguous vector of bins;
the kernel reads entry (i, j) as one (rows, 128) tile and the N x N
recurrences are unrolled in Python (N <= 8).  This mirrors the
reference's per-bin LAPACK solves
(/root/reference/scripts/sptk/libs/beamformer.py:515-539, cheev/ctrsm in
include/cblas-cpl-wrappers.h) re-shaped for a lane-parallel machine:
one bin per lane instead of one matrix per call.

Pipeline inside the kernel (parity with enhance.beamformer.mvdr_weights
steer="power"):
  1. hermitianize Rs; fixed-count power iteration -> principal eigvec
  2. phase-anchor to mic 0 (fix_steer_phase)
  3. hermitianize Rn + scale-invariant diagonal loading
  4. unrolled complex Cholesky; forward/backward solve  x = Rn^{-1} d
  5. Capon normalize w = x / (d^H x)
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from setk_tpu.utils.common import EPSILON

__all__ = ["mvdr_power_pallas"]

_ROWS = 8  # sublanes per bin tile; lane count is the fixed 128


def _cmul(ar, ai, br, bi):
    """(ar + i ai) * (br + i bi) -> (re, im)."""
    return ar * br - ai * bi, ar * bi + ai * br


def _cmul_conj(ar, ai, br, bi):
    """(ar + i ai) * conj(br + i bi) -> (re, im)."""
    return ar * br + ai * bi, ai * br - ar * bi


def _mvdr_kernel(n, power_iters, eps_rel, rs_re_ref, rs_im_ref, rn_re_ref,
                 rn_im_ref, w_re_ref, w_im_ref):
    def entry(ref_re, ref_im, i, j):
        return ref_re[i * n + j, 0], ref_im[i * n + j, 0]

    def herm(ref_re, ref_im):
        """0.5 (R + R^H) as planar n x n lists of (rows, 128) tiles."""
        h_re = [[None] * n for _ in range(n)]
        h_im = [[None] * n for _ in range(n)]
        for i in range(n):
            for j in range(i, n):
                a_re, a_im = entry(ref_re, ref_im, i, j)
                b_re, b_im = entry(ref_re, ref_im, j, i)
                h_re[i][j] = 0.5 * (a_re + b_re)
                h_im[i][j] = 0.5 * (a_im - b_im)
                if j != i:
                    h_re[j][i] = h_re[i][j]
                    h_im[j][i] = -h_im[i][j]
        return h_re, h_im

    # ---- 1. steer vector: power iteration on hermitianized Rs ----
    s_re, s_im = herm(rs_re_ref, rs_im_ref)
    shape = s_re[0][0].shape
    # ramp init de-symmetrizes (matches ops.linalg.power_iteration)
    v_re = [jnp.full(shape, (k + 1.0) / n, jnp.float32) for k in range(n)]
    v_im = [jnp.zeros(shape, jnp.float32) for _ in range(n)]
    for _ in range(power_iters):
        u_re, u_im = [], []
        for i in range(n):
            acc_re = jnp.zeros(shape, jnp.float32)
            acc_im = jnp.zeros(shape, jnp.float32)
            for j in range(n):
                p_re, p_im = _cmul(s_re[i][j], s_im[i][j], v_re[j], v_im[j])
                acc_re += p_re
                acc_im += p_im
            u_re.append(acc_re)
            u_im.append(acc_im)
        nrm2 = sum(u_re[i] * u_re[i] + u_im[i] * u_im[i] for i in range(n))
        inv = jax.lax.rsqrt(jnp.maximum(nrm2, EPSILON * EPSILON))
        v_re = [u * inv for u in u_re]
        v_im = [u * inv for u in u_im]

    # ---- 2. phase anchor to channel 0 (fix_steer_phase) ----
    mag = jnp.sqrt(v_re[0] * v_re[0] + v_im[0] * v_im[0])
    inv_mag = 1.0 / jnp.maximum(mag, EPSILON)
    p_re = v_re[0] * inv_mag
    p_im = -v_im[0] * inv_mag  # conj(phase)
    d_re, d_im = [], []
    for i in range(n):
        dr, di = _cmul(v_re[i], v_im[i], p_re, p_im)
        d_re.append(dr)
        d_im.append(di)

    # ---- 3. Rn hermitianize + scale-invariant diagonal loading ----
    a_re, a_im = herm(rn_re_ref, rn_im_ref)
    tr = sum(a_re[i][i] for i in range(n)) * (1.0 / n)
    load = eps_rel * tr + EPSILON
    for i in range(n):
        a_re[i][i] = a_re[i][i] + load

    # ---- 4. unrolled complex Cholesky; solve Rn x = d ----
    l_re = [[None] * n for _ in range(n)]
    l_im = [[None] * n for _ in range(n)]
    inv_diag = [None] * n
    for j in range(n):
        dj = a_re[j][j]
        for q in range(j):
            dj = dj - (l_re[j][q] * l_re[j][q] + l_im[j][q] * l_im[j][q])
        inv_diag[j] = jax.lax.rsqrt(jnp.maximum(dj, EPSILON))
        for i in range(j + 1, n):
            s_r, s_i = a_re[i][j], a_im[i][j]
            for q in range(j):
                p_r, p_i = _cmul_conj(l_re[i][q], l_im[i][q], l_re[j][q],
                                      l_im[j][q])
                s_r = s_r - p_r
                s_i = s_i - p_i
            l_re[i][j] = s_r * inv_diag[j]
            l_im[i][j] = s_i * inv_diag[j]
    # forward: L y = d
    y_re, y_im = [None] * n, [None] * n
    for i in range(n):
        s_r, s_i = d_re[i], d_im[i]
        for q in range(i):
            p_r, p_i = _cmul(l_re[i][q], l_im[i][q], y_re[q], y_im[q])
            s_r = s_r - p_r
            s_i = s_i - p_i
        y_re[i] = s_r * inv_diag[i]
        y_im[i] = s_i * inv_diag[i]
    # backward: L^H x = y
    x_re, x_im = [None] * n, [None] * n
    for i in reversed(range(n)):
        s_r, s_i = y_re[i], y_im[i]
        for q in range(i + 1, n):
            # conj(L[q][i]) * x[q]
            p_r, p_i = _cmul(l_re[q][i], -l_im[q][i], x_re[q], x_im[q])
            s_r = s_r - p_r
            s_i = s_i - p_i
        x_re[i] = s_r * inv_diag[i]
        x_im[i] = s_i * inv_diag[i]

    # ---- 5. Capon normalize: w = x / (d^H x) ----
    den_re = jnp.zeros(shape, jnp.float32)
    den_im = jnp.zeros(shape, jnp.float32)
    for i in range(n):
        # conj(d) * x
        p_r, p_i = _cmul(d_re[i], -d_im[i], x_re[i], x_im[i])
        den_re += p_r
        den_im += p_i
    inv_den = 1.0 / jnp.maximum(den_re * den_re + den_im * den_im,
                                EPSILON * EPSILON)
    for i in range(n):
        # x / den = x * conj(den) / |den|^2
        w_r, w_i = _cmul_conj(x_re[i], x_im[i], den_re, den_im)
        w_re_ref[i, 0] = w_r * inv_den
        w_im_ref[i, 0] = w_i * inv_den


@partial(jax.jit,
         static_argnames=("power_iters", "eps_rel", "interpret"))
def _mvdr_pallas_flat(rs_re, rs_im, rn_re, rn_im, power_iters, eps_rel,
                      interpret):
    """Entry-major planar solve: (N*N, NB, rows, 128) -> (N, NB, rows, 128)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    nn, nb, rows, lanes = rs_re.shape
    n = int(np.sqrt(nn))
    kernel = partial(_mvdr_kernel, n, power_iters, eps_rel)
    in_spec = pl.BlockSpec((nn, 1, rows, lanes), lambda i: (0, i, 0, 0),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((n, 1, rows, lanes), lambda i: (0, i, 0, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[in_spec] * 4,
        out_specs=[out_spec, out_spec],
        out_shape=[
            jax.ShapeDtypeStruct((n, nb, rows, lanes), jnp.float32),
            jax.ShapeDtypeStruct((n, nb, rows, lanes), jnp.float32),
        ],
        interpret=interpret,
    )(rs_re, rs_im, rn_re, rn_im)


def mvdr_power_pallas(rs: jax.Array,
                      rn: jax.Array,
                      power_iters: int = 15,
                      eps_rel: float = 1e-6,
                      interpret: bool = False) -> jax.Array:
    """Fused MVDR weights from (..., N, N) Rs/Rn covariances.

    Drop-in for ``mvdr_weights(rs, rn, steer="power")`` (same math, same
    iteration count); complex in/out, any leading batch shape, N <= 8.
    """
    n = rs.shape[-1]
    lead = rs.shape[:-2]
    bf = int(np.prod(lead)) if lead else 1
    tile = _ROWS * 128

    def to_entry_major(mat):
        flat = mat.reshape(bf, n * n)
        em = jnp.transpose(flat, (1, 0))  # (N*N, BF)
        pad = (-bf) % tile
        if pad:
            em = jnp.pad(em, ((0, 0), (0, pad)))
        return em.reshape(n * n, -1, _ROWS, 128)

    args = []
    for mat in (rs, rn):
        em_re = to_entry_major(jnp.real(mat).astype(jnp.float32))
        em_im = to_entry_major(jnp.imag(mat).astype(jnp.float32))
        args.extend([em_re, em_im])
    w_re, w_im = _mvdr_pallas_flat(*args, power_iters=power_iters,
                                   eps_rel=eps_rel, interpret=interpret)
    w = (w_re + 1j * w_im).reshape(n, -1)[:, :bf]
    return jnp.transpose(w, (1, 0)).reshape(*lead, n).astype(rs.dtype)
