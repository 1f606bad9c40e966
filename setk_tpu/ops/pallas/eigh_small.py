"""Pallas TPU kernel: lane-batched Jacobi EVD for small Hermitian mats.

The clustering EM (enhance/cluster.py) spends ~60% of its step in
XLA's batched complex ``eigh`` on (K, B, F, M, M) covariances — LAPACK-
style library calls at tiny occupancy (1.35 ms per call for 4k 6x6 on
the attached v5e).  This kernel assigns each matrix to a lane position
of an (8, 128) tile and runs a FIXED-SWEEP cyclic complex Jacobi
eigensolver whose rotations are statically unrolled Python loops over
planar (8, 128) registers — exactly the per-bin LAPACK -> lane-parallel
transformation of ops/pallas/mvdr.py, applied to the EVD.

A hand-written batched Jacobi in *XLA* was 35x WORSE than library eigh
(ops/jacobi.py keeps that negative result): per-rotation layout traffic
killed it.  Inside one Pallas kernel every rotation is register-resident
VPU arithmetic over 1024 matrices at once.

The public entry reproduces ops.linalg.regularized_inverse semantics
bit-for-bit in structure (reference parity:
/root/reference/scripts/sptk/libs/cluster.py:94-135 — eigenvalues
scaled by their max, floored at EPSILON, inverted; logdet of the scaled
floored spectrum), so it drops into the EM unchanged.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from setk_tpu.utils.common import EPSILON

__all__ = ["regularized_inverse_pallas", "jacobi_regularized_inverse"]

_ROWS = 8
_LANES = 128
_SWEEPS = 6
_TINY = 1e-30


def jacobi_regularized_inverse(a_re, a_im, m, sweeps):
    """Shared in-kernel cyclic-Jacobi eigenvalue-floored inverse.

    a_re/a_im: m x m lists of equally-shaped f32 arrays (one batched
    matrix entry per array position — any register-resident tile shape).
    Returns (inv_re, inv_im, logdet) with the reference's regularization
    (eigenvalues scaled by max, floored at EPSILON, inverted; logdet of
    the scaled floored spectrum — /root/reference/scripts/sptk/libs/
    cluster.py:94-135).  Used by the standalone EVD kernel below and by
    the fused CACGMM EM kernel (ops/pallas/cacgmm_em.py).
    """
    shape = a_re[0][0].shape
    # hermitianize on load: a[i][j] = 0.5 (A[i][j] + conj(A[j][i]))
    h_re = [[None] * m for _ in range(m)]
    h_im = [[None] * m for _ in range(m)]
    for i in range(m):
        for j in range(i, m):
            h_re[i][j] = 0.5 * (a_re[i][j] + a_re[j][i])
            h_im[i][j] = 0.5 * (a_im[i][j] - a_im[j][i])
            if j != i:
                h_re[j][i] = h_re[i][j]
                h_im[j][i] = -h_im[i][j]
            else:
                h_im[i][i] = jnp.zeros(shape, jnp.float32)
    a_re, a_im = h_re, h_im
    # eigenvector accumulator V = I
    v_re = [[jnp.full(shape, 1.0 if i == j else 0.0, jnp.float32)
             for j in range(m)] for i in range(m)]
    v_im = [[jnp.zeros(shape, jnp.float32) for _ in range(m)]
            for _ in range(m)]

    def one_sweep(_, state):
        a_re, a_im, v_re, v_im = [list(map(list, rows)) for rows in state]
        for p in range(m - 1):
            for q in range(p + 1, m):
                apq_re, apq_im = a_re[p][q], a_im[p][q]
                r2 = apq_re * apq_re + apq_im * apq_im
                r = jnp.sqrt(jnp.maximum(r2, _TINY))
                # phase e^{i phi} = apq / r; MUST default to 1 (not 0)
                # for annihilated off-diagonals or G[q][q] = conj(ph) c
                # goes singular and the similarity silently loses
                # eigenvalues (measured: trace collapse on sweep 5)
                safe = r2 > _TINY
                ph_re = jnp.where(safe, apq_re / r, 1.0)
                ph_im = jnp.where(safe, apq_im / r, 0.0)
                # real 2x2 [[app, r], [r, aqq]] Jacobi angle
                tau = (a_re[q][q] - a_re[p][p]) / (2.0 * r)
                sgn = jnp.where(tau >= 0, 1.0, -1.0)
                t = sgn / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
                c = jax.lax.rsqrt(1.0 + t * t)
                s = t * c
                # G[p][p]=c, G[p][q]=s, G[q][p]=-conj(ph) s, G[q][q]=conj(ph) c
                gqp_re, gqp_im = -ph_re * s, ph_im * s
                gqq_re, gqq_im = ph_re * c, -ph_im * c
                gpq_re, gpq_im = s, 0.0

                # columns: A <- A G on columns p, q
                for k in range(m):
                    akp_re, akp_im = a_re[k][p], a_im[k][p]
                    akq_re, akq_im = a_re[k][q], a_im[k][q]
                    a_re[k][p] = (akp_re * c +
                                  akq_re * gqp_re - akq_im * gqp_im)
                    a_im[k][p] = (akp_im * c +
                                  akq_re * gqp_im + akq_im * gqp_re)
                    a_re[k][q] = (akp_re * gpq_re +
                                  akq_re * gqq_re - akq_im * gqq_im)
                    a_im[k][q] = (akp_im * gpq_re +
                                  akq_re * gqq_im + akq_im * gqq_re)
                # rows: A <- G^H A on rows p, q
                for k in range(m):
                    apk_re, apk_im = a_re[p][k], a_im[p][k]
                    aqk_re, aqk_im = a_re[q][k], a_im[q][k]
                    a_re[p][k] = (apk_re * c +
                                  aqk_re * gqp_re + aqk_im * gqp_im)
                    a_im[p][k] = (apk_im * c +
                                  aqk_im * gqp_re - aqk_re * gqp_im)
                    a_re[q][k] = (apk_re * gpq_re +
                                  aqk_re * gqq_re + aqk_im * gqq_im)
                    a_im[q][k] = (apk_im * gpq_re +
                                  aqk_im * gqq_re - aqk_re * gqq_im)
                # V <- V G
                for k in range(m):
                    vkp_re, vkp_im = v_re[k][p], v_im[k][p]
                    vkq_re, vkq_im = v_re[k][q], v_im[k][q]
                    v_re[k][p] = (vkp_re * c +
                                  vkq_re * gqp_re - vkq_im * gqp_im)
                    v_im[k][p] = (vkp_im * c +
                                  vkq_re * gqp_im + vkq_im * gqp_re)
                    v_re[k][q] = (vkp_re * gpq_re +
                                  vkq_re * gqq_re - vkq_im * gqq_im)
                    v_im[k][q] = (vkp_im * gpq_re +
                                  vkq_re * gqq_im + vkq_im * gqq_re)
        return (tuple(map(tuple, a_re)), tuple(map(tuple, a_im)),
                tuple(map(tuple, v_re)), tuple(map(tuple, v_im)))

    state = (tuple(map(tuple, a_re)), tuple(map(tuple, a_im)),
             tuple(map(tuple, v_re)), tuple(map(tuple, v_im)))
    a_re, a_im, v_re, v_im = jax.lax.fori_loop(0, sweeps, one_sweep, state)

    # reference regularization: w /= max(w); w = max(w, EPS);
    # inv = V diag(1/w) V^H; logdet = sum log w  (scaled spectrum)
    w = [a_re[i][i] for i in range(m)]
    wmax = w[0]
    for i in range(1, m):
        wmax = jnp.maximum(wmax, w[i])
    wmax = jnp.maximum(wmax, EPSILON)
    winv = []
    logdet = jnp.zeros(shape, jnp.float32)
    for i in range(m):
        wi = jnp.maximum(w[i] / wmax, EPSILON)
        logdet += jnp.log(wi)
        winv.append(1.0 / wi)
    inv_re = [[None] * m for _ in range(m)]
    inv_im = [[None] * m for _ in range(m)]
    for i in range(m):
        for j in range(i, m):
            acc_re = jnp.zeros(shape, jnp.float32)
            acc_im = jnp.zeros(shape, jnp.float32)
            for y in range(m):
                # V[i][y] * winv[y] * conj(V[j][y])
                p_re = v_re[i][y] * v_re[j][y] + v_im[i][y] * v_im[j][y]
                p_im = v_im[i][y] * v_re[j][y] - v_re[i][y] * v_im[j][y]
                acc_re += p_re * winv[y]
                acc_im += p_im * winv[y]
            inv_re[i][j], inv_im[i][j] = acc_re, acc_im
            if j != i:
                inv_re[j][i], inv_im[j][i] = acc_re, -acc_im
    return inv_re, inv_im, logdet


def _jacobi_kernel(m, sweeps, ar_ref, ai_ref, ir_ref, ii_ref, ld_ref):
    a_re = [[ar_ref[i * m + j, 0] for j in range(m)] for i in range(m)]
    a_im = [[ai_ref[i * m + j, 0] for j in range(m)] for i in range(m)]
    inv_re, inv_im, logdet = jacobi_regularized_inverse(
        a_re, a_im, m, sweeps)
    ld_ref[0, 0] = logdet
    for i in range(m):
        for j in range(m):
            ir_ref[i * m + j, 0] = inv_re[i][j]
            ii_ref[i * m + j, 0] = inv_im[i][j]


@partial(jax.jit, static_argnames=("sweeps", "interpret"))
def _jacobi_flat(ar, ai, sweeps, interpret):
    """Entry-major planar EVD inverse: (M*M, NB, 8, 128) planes."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    mm, nb, rows, lanes = ar.shape
    m = int(np.sqrt(mm))
    in_spec = pl.BlockSpec((mm, 1, rows, lanes), lambda i: (0, i, 0, 0),
                           memory_space=pltpu.VMEM)
    ld_spec = pl.BlockSpec((1, 1, rows, lanes), lambda i: (0, i, 0, 0),
                           memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_jacobi_kernel, m, sweeps),
        grid=(nb,),
        in_specs=[in_spec, in_spec],
        out_specs=[in_spec, in_spec, ld_spec],
        out_shape=[
            jax.ShapeDtypeStruct((mm, nb, rows, lanes), jnp.float32),
            jax.ShapeDtypeStruct((mm, nb, rows, lanes), jnp.float32),
            jax.ShapeDtypeStruct((1, nb, rows, lanes), jnp.float32),
        ],
        interpret=interpret,
    )(ar, ai)


def regularized_inverse_pallas(covar: jax.Array,
                               return_logdet: bool = False,
                               sweeps: int = _SWEEPS,
                               interpret: bool = False):
    """Drop-in for ops.linalg.regularized_inverse on TPU (M <= 8).

    covar (..., M, M) complex Hermitian-ish; returns the eigenvalue-
    floored inverse (and the scaled-spectrum logdet when requested).
    """
    m = covar.shape[-1]
    lead = covar.shape[:-2]
    bf = int(np.prod(lead)) if lead else 1
    tile = _ROWS * _LANES

    def to_entry_major(plane):
        em = jnp.transpose(plane.reshape(bf, m * m), (1, 0))
        pad = (-bf) % tile
        if pad:
            em = jnp.pad(em, ((0, 0), (0, pad)))
        return em.reshape(m * m, -1, _ROWS, _LANES)

    ar = to_entry_major(jnp.real(covar).astype(jnp.float32))
    ai = to_entry_major(jnp.imag(covar).astype(jnp.float32))
    ir, ii, ld = _jacobi_flat(ar, ai, sweeps=sweeps, interpret=interpret)
    inv = (ir + 1j * ii).reshape(m * m, -1)[:, :bf]
    inv = jnp.transpose(inv, (1, 0)).reshape(*lead, m, m).astype(covar.dtype)
    if not return_logdet:
        return inv
    logdet = ld.reshape(-1)[:bf].reshape(lead)
    return inv, logdet
