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

__all__ = ["mvdr_power_pallas", "gevd_power_pallas",
           "pmwf_solve_pallas", "capon_pallas"]

_ROWS = 8  # sublanes per bin tile; lane count is the fixed 128


def _cmul(ar, ai, br, bi):
    """(ar + i ai) * (br + i bi) -> (re, im)."""
    return ar * br - ai * bi, ar * bi + ai * br


def _cmul_conj(ar, ai, br, bi):
    """(ar + i ai) * conj(br + i bi) -> (re, im)."""
    return ar * br + ai * bi, ai * br - ar * bi


def _load_herm(ref_re, ref_im, n):
    """0.5 (R + R^H) from an entry-major ref, as planar n x n lists of
    (rows, 128) tiles."""
    h_re = [[None] * n for _ in range(n)]
    h_im = [[None] * n for _ in range(n)]
    for i in range(n):
        for j in range(i, n):
            a_re, a_im = ref_re[i * n + j, 0], ref_im[i * n + j, 0]
            b_re, b_im = ref_re[j * n + i, 0], ref_im[j * n + i, 0]
            h_re[i][j] = 0.5 * (a_re + b_re)
            h_im[i][j] = 0.5 * (a_im - b_im)
            if j != i:
                h_re[j][i] = h_re[i][j]
                h_im[j][i] = -h_im[i][j]
    return h_re, h_im


def _load_diag(a_re, n, eps_rel):
    """Scale-invariant diagonal loading, in place."""
    tr = sum(a_re[i][i] for i in range(n)) * (1.0 / n)
    load = eps_rel * tr + EPSILON
    for i in range(n):
        a_re[i][i] = a_re[i][i] + load


def _cholesky(a_re, a_im, n):
    """Unrolled complex Cholesky of a loaded Hermitian tile matrix."""
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
    return l_re, l_im, inv_diag


def _equilibrated_cholesky(a_re, a_im, n, eps_rel):
    """Symmetric Jacobi equilibration + absolute loading + Cholesky.

    Rank-deficient covariances (saturated masks leave (1 - m) ~ 0 over
    a whole bin) make the plain guarded Cholesky INCONSISTENT: pivots
    hit the EPSILON floor while their off-diagonal columns stay large,
    and back-substitution cascades ~x2.6e8 per level into Inf -> NaN
    (observed on the CACGMM->MVDR cascade, utterance-deterministic, on
    BOTH the kernel and XLA paths).  Equilibrating to a unit diagonal
    and loading at the f32 rounding floor (>= 4 N eps) keeps the
    triangle consistent; callers unscale solutions with the returned
    per-row scale (exact math, same as ops.linalg.
    equilibrated_hermitian_solve).
    Returns (l_re, l_im, inv_diag, dscale).
    """
    load = max(eps_rel, 4.0 * n * float(EPSILON))
    dscale = []
    for i in range(n):
        dii = a_re[i][i]
        dscale.append(jnp.where(dii > 0.0,
                                jax.lax.rsqrt(jnp.maximum(dii, 1e-30)),
                                1.0))
    e_re = [[a_re[i][j] * dscale[i] * dscale[j] for j in range(n)]
            for i in range(n)]
    e_im = [[a_im[i][j] * dscale[i] * dscale[j] for j in range(n)]
            for i in range(n)]
    for i in range(n):
        e_re[i][i] = e_re[i][i] + load
    l_re, l_im, inv_diag = _cholesky(e_re, e_im, n)
    return l_re, l_im, inv_diag, dscale


def _equilibrated_chol_solve(l_re, l_im, inv_diag, dscale, b_re, b_im, n):
    """Solve the ORIGINAL system through the equilibrated factor:
    x = D solve(D A D, D b)."""
    bs_re = [b_re[i] * dscale[i] for i in range(n)]
    bs_im = [b_im[i] * dscale[i] for i in range(n)]
    x_re, x_im = _chol_solve(l_re, l_im, inv_diag, bs_re, bs_im, n)
    return ([x_re[i] * dscale[i] for i in range(n)],
            [x_im[i] * dscale[i] for i in range(n)])


def _chol_solve(l_re, l_im, inv_diag, b_re, b_im, n):
    """Solve L L^H x = b (planar tile vectors)."""
    y_re, y_im = [None] * n, [None] * n
    for i in range(n):
        s_r, s_i = b_re[i], b_im[i]
        for q in range(i):
            p_r, p_i = _cmul(l_re[i][q], l_im[i][q], y_re[q], y_im[q])
            s_r = s_r - p_r
            s_i = s_i - p_i
        y_re[i] = s_r * inv_diag[i]
        y_im[i] = s_i * inv_diag[i]
    x_re, x_im = [None] * n, [None] * n
    for i in reversed(range(n)):
        s_r, s_i = y_re[i], y_im[i]
        for q in range(i + 1, n):
            p_r, p_i = _cmul(l_re[q][i], -l_im[q][i], x_re[q], x_im[q])
            s_r = s_r - p_r
            s_i = s_i - p_i
        x_re[i] = s_r * inv_diag[i]
        x_im[i] = s_i * inv_diag[i]
    return x_re, x_im


def _matvec(m_re, m_im, v_re, v_im, n, shape):
    u_re, u_im = [], []
    for i in range(n):
        acc_re = jnp.zeros(shape, jnp.float32)
        acc_im = jnp.zeros(shape, jnp.float32)
        for j in range(n):
            p_re, p_im = _cmul(m_re[i][j], m_im[i][j], v_re[j], v_im[j])
            acc_re += p_re
            acc_im += p_im
        u_re.append(acc_re)
        u_im.append(acc_im)
    return u_re, u_im


def _anchor_phase(v_re, v_im, n, shape):
    """Rotate so channel 0 is real-positive (fix_steer_phase)."""
    mag = jnp.sqrt(v_re[0] * v_re[0] + v_im[0] * v_im[0])
    inv_mag = 1.0 / jnp.maximum(mag, EPSILON)
    p_re = v_re[0] * inv_mag
    p_im = -v_im[0] * inv_mag  # conj(phase)
    d_re, d_im = [], []
    for i in range(n):
        dr, di = _cmul(v_re[i], v_im[i], p_re, p_im)
        d_re.append(dr)
        d_im.append(di)
    return d_re, d_im


def _hermitianize_tiles(m_re, m_im, n):
    """Value-level 0.5 (R + R^H) over n x n lists of tiles."""
    h_re = [[None] * n for _ in range(n)]
    h_im = [[None] * n for _ in range(n)]
    for i in range(n):
        for j in range(i, n):
            h_re[i][j] = 0.5 * (m_re[i][j] + m_re[j][i])
            h_im[i][j] = 0.5 * (m_im[i][j] - m_im[j][i])
            if j != i:
                h_re[j][i] = h_re[i][j]
                h_im[j][i] = -h_im[i][j]
    return h_re, h_im


def mvdr_weights_tiles(rs_re, rs_im, rn_re, rn_im, n, power_iters,
                       eps_rel):
    """In-kernel MVDR weight solve on n x n lists of planar tile values
    (any tile shape; every position an independent bin).  Returns
    (w_re, w_im) lists.  Shared by the standalone weights kernel below
    and the fused online pipeline (fused_mvdr.stft_covar_online_pallas),
    which solves per EMA chunk inside the covariance kernel.
    """
    # ---- 1. steer vector: power iteration on hermitianized Rs ----
    s_re, s_im = _hermitianize_tiles(rs_re, rs_im, n)
    shape = s_re[0][0].shape
    # ramp init de-symmetrizes (matches ops.linalg.power_iteration)
    v_re = [jnp.full(shape, (k + 1.0) / n, jnp.float32) for k in range(n)]
    v_im = [jnp.zeros(shape, jnp.float32) for _ in range(n)]
    for _ in range(power_iters):
        u_re, u_im = _matvec(s_re, s_im, v_re, v_im, n, shape)
        nrm2 = sum(u_re[i] * u_re[i] + u_im[i] * u_im[i] for i in range(n))
        inv = jax.lax.rsqrt(jnp.maximum(nrm2, EPSILON * EPSILON))
        v_re = [u * inv for u in u_re]
        v_im = [u * inv for u in u_im]

    # ---- 2. phase anchor to channel 0 (fix_steer_phase) ----
    d_re, d_im = _anchor_phase(v_re, v_im, n, shape)

    # ---- 3+4. equilibrated Cholesky; solve Rn x = d ----
    a_re, a_im = _hermitianize_tiles(rn_re, rn_im, n)
    l_re, l_im, inv_diag, dsc = _equilibrated_cholesky(a_re, a_im, n,
                                                       eps_rel)
    x_re, x_im = _equilibrated_chol_solve(l_re, l_im, inv_diag, dsc,
                                          d_re, d_im, n)

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
    w_re, w_im = [None] * n, [None] * n
    for i in range(n):
        # x / den = x * conj(den) / |den|^2
        w_r, w_i = _cmul_conj(x_re[i], x_im[i], den_re, den_im)
        w_re[i] = w_r * inv_den
        w_im[i] = w_i * inv_den
    return w_re, w_im


def _mvdr_kernel(n, power_iters, eps_rel, rs_re_ref, rs_im_ref, rn_re_ref,
                 rn_im_ref, w_re_ref, w_im_ref):
    rs_re = [[rs_re_ref[i * n + j, 0] for j in range(n)] for i in range(n)]
    rs_im = [[rs_im_ref[i * n + j, 0] for j in range(n)] for i in range(n)]
    rn_re = [[rn_re_ref[i * n + j, 0] for j in range(n)] for i in range(n)]
    rn_im = [[rn_im_ref[i * n + j, 0] for j in range(n)] for i in range(n)]
    w_re, w_im = mvdr_weights_tiles(rs_re, rs_im, rn_re, rn_im, n,
                                    power_iters, eps_rel)
    for i in range(n):
        w_re_ref[i, 0] = w_re[i]
        w_im_ref[i, 0] = w_im[i]


def _gevd_kernel(n, power_iters, eps_rel, rs_re_ref, rs_im_ref, rn_re_ref,
                 rn_im_ref, w_re_ref, w_im_ref):
    """Principal generalized eigenvector of (Rs, Rn) per lane-bin.

    Power iteration on Rn^{-1} Rs (each step: Rs matvec + Cholesky
    solve); output normalized to v^H Rn v = 1 (scipy's generalized-eigh
    convention, matching ops.linalg.solve_pevd up to per-bin phase) and
    phase-anchored to channel 0 (eigenvector phase is solver-arbitrary;
    the anchor makes it deterministic)."""
    s_re, s_im = _load_herm(rs_re_ref, rs_im_ref, n)
    shape = s_re[0][0].shape
    a_re, a_im = _load_herm(rn_re_ref, rn_im_ref, n)
    l_re, l_im, inv_diag, dsc = _equilibrated_cholesky(a_re, a_im, n,
                                                       eps_rel)
    v_re = [jnp.full(shape, (k + 1.0) / n, jnp.float32) for k in range(n)]
    v_im = [jnp.zeros(shape, jnp.float32) for _ in range(n)]
    for _ in range(power_iters):
        u_re, u_im = _matvec(s_re, s_im, v_re, v_im, n, shape)
        x_re, x_im = _equilibrated_chol_solve(l_re, l_im, inv_diag, dsc,
                                              u_re, u_im, n)
        nrm2 = sum(x_re[i] * x_re[i] + x_im[i] * x_im[i] for i in range(n))
        inv = jax.lax.rsqrt(jnp.maximum(nrm2, EPSILON * EPSILON))
        v_re = [x * inv for x in x_re]
        v_im = [x * inv for x in x_im]
    # v^H Rn v = 1 normalization (real by symmetry)
    av_re, av_im = _matvec(a_re, a_im, v_re, v_im, n, shape)
    q = sum(v_re[i] * av_re[i] + v_im[i] * av_im[i] for i in range(n))
    scale = jax.lax.rsqrt(jnp.maximum(q, EPSILON))
    v_re = [v * scale for v in v_re]
    v_im = [v * scale for v in v_im]
    d_re, d_im = _anchor_phase(v_re, v_im, n, shape)
    for i in range(n):
        w_re_ref[i, 0] = d_re[i]
        w_im_ref[i, 0] = d_im[i]


def _capon_kernel(n, eps_rel, d_re_ref, d_im_ref, r_re_ref, r_im_ref,
                  w_re_ref, w_im_ref):
    """Capon weights for a GIVEN steer vector: w = R^{-1}d / (d^H R^{-1}d).

    The mpdr-whiten path computes its steer (Rn x GEV vector) in XLA and
    solves against Ry here."""
    d_re = [d_re_ref[i, 0] for i in range(n)]
    d_im = [d_im_ref[i, 0] for i in range(n)]
    shape = d_re[0].shape
    a_re, a_im = _load_herm(r_re_ref, r_im_ref, n)
    l_re, l_im, inv_diag, dsc = _equilibrated_cholesky(a_re, a_im, n,
                                                       eps_rel)
    x_re, x_im = _equilibrated_chol_solve(l_re, l_im, inv_diag, dsc,
                                          d_re, d_im, n)
    den_re = jnp.zeros(shape, jnp.float32)
    den_im = jnp.zeros(shape, jnp.float32)
    for i in range(n):
        p_r, p_i = _cmul(d_re[i], -d_im[i], x_re[i], x_im[i])
        den_re += p_r
        den_im += p_i
    inv_den = 1.0 / jnp.maximum(den_re * den_re + den_im * den_im,
                                EPSILON * EPSILON)
    for i in range(n):
        w_r, w_i = _cmul_conj(x_re[i], x_im[i], den_re, den_im)
        w_re_ref[i, 0] = w_r * inv_den
        w_im_ref[i, 0] = w_i * inv_den


def _pmwf_kernel(n, beta, eps_rel, with_powers, rs_re_ref, rs_im_ref,
                 rn_re_ref, rn_im_ref, w_re_ref, w_im_ref, *pow_refs):
    """PMWF weight matrix per lane-bin: W = Rn^{-1} Rs / (beta + trace).

    Emits the full (N, N) weight matrix (entry-major).  With
    ``with_powers`` it also emits the per-channel SNR-selection powers
    ps_c = Re(w_c^H Rs w_c), pn_c = Re(w_c^H Rn w_c) — the XLA einsum
    pair behind pmwf_select_ref lowers to MXU-hostile tiny-N batched
    matmuls, while in-kernel they are ~2 N^3 extra VPU FMAs on
    resident tiles."""
    s_re, s_im = _load_herm(rs_re_ref, rs_im_ref, n)
    a_re, a_im = _load_herm(rn_re_ref, rn_im_ref, n)
    l_re, l_im, inv_diag, dsc = _equilibrated_cholesky(a_re, a_im, n,
                                                       eps_rel)
    x_re = [[None] * n for _ in range(n)]
    x_im = [[None] * n for _ in range(n)]
    for j in range(n):
        col_re, col_im = _equilibrated_chol_solve(
            l_re, l_im, inv_diag, dsc,
            [s_re[i][j] for i in range(n)],
            [s_im[i][j] for i in range(n)], n)
        for i in range(n):
            x_re[i][j] = col_re[i]
            x_im[i][j] = col_im[i]
    tr_re = sum(x_re[i][i] for i in range(n)) + beta
    tr_im = sum(x_im[i][i] for i in range(n))
    inv_den = 1.0 / jnp.maximum(tr_re * tr_re + tr_im * tr_im,
                                EPSILON * EPSILON)
    w_re = [[None] * n for _ in range(n)]
    w_im = [[None] * n for _ in range(n)]
    for i in range(n):
        for j in range(n):
            w_r, w_i = _cmul_conj(x_re[i][j], x_im[i][j], tr_re, tr_im)
            w_re[i][j] = w_r * inv_den
            w_im[i][j] = w_i * inv_den
            w_re_ref[i * n + j, 0] = w_re[i][j]
            w_im_ref[i * n + j, 0] = w_im[i][j]
    if not with_powers:
        return
    ps_ref, pn_ref = pow_refs
    # raw (unloaded) Rn for pn, matching the XLA selection semantics
    b_re, b_im = _load_herm(rn_re_ref, rn_im_ref, n)
    shape = w_re[0][0].shape
    for c in range(n):
        wc_re = [w_re[i][c] for i in range(n)]
        wc_im = [w_im[i][c] for i in range(n)]
        for mat_re, mat_im, out_ref in ((s_re, s_im, ps_ref),
                                        (b_re, b_im, pn_ref)):
            u_re, u_im = _matvec(mat_re, mat_im, wc_re, wc_im, n, shape)
            acc = jnp.zeros(shape, jnp.float32)
            for i in range(n):
                acc = acc + wc_re[i] * u_re[i] + wc_im[i] * u_im[i]
            out_ref[c, 0] = acc


def _weights_pallas_flat(kernel_fn, n_out, rs_re, rs_im, rn_re, rn_im,
                         interpret):
    """Entry-major planar solve: 4 x (N*N, NB, rows, 128) inputs ->
    planar outputs.  ``n_out`` is an int (two re/im outputs of that
    width) or a tuple of per-output widths."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    nn, nb, rows, lanes = rs_re.shape
    dims = (n_out, n_out) if isinstance(n_out, int) else tuple(n_out)
    in_spec = pl.BlockSpec((nn, 1, rows, lanes), lambda i: (0, i, 0, 0),
                           memory_space=pltpu.VMEM)

    def out_spec(d):
        return pl.BlockSpec((d, 1, rows, lanes), lambda i: (0, i, 0, 0),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        kernel_fn,
        grid=(nb,),
        in_specs=[in_spec] * 4,
        out_specs=[out_spec(d) for d in dims],
        out_shape=[
            jax.ShapeDtypeStruct((d, nb, rows, lanes), jnp.float32)
            for d in dims
        ],
        interpret=interpret,
    )(rs_re, rs_im, rn_re, rn_im)


def _pack_entry_major(rs, rn, n):
    """(..., N, N) complex pair -> 4 planar (N*N, NB, rows, 128) args."""
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
        args.append(to_entry_major(jnp.real(mat).astype(jnp.float32)))
        args.append(to_entry_major(jnp.imag(mat).astype(jnp.float32)))
    return args, lead, bf


def _unpack_planar(plane, lead, bf, n_out):
    """(n_out, NB, rows, 128) planar -> (..., n_out) f32."""
    flat = plane.reshape(n_out, -1)[:, :bf]
    return jnp.transpose(flat, (1, 0)).reshape(*lead, n_out)


def _run_entry_major(kernel, n, n_out, rs, rn, interpret):
    """Pack (..., N, N) complex pairs entry-major, run, unpack to
    (..., n_out) complex."""
    args, lead, bf = _pack_entry_major(rs, rn, n)
    w_re, w_im = _weights_pallas_flat(kernel, n_out, *args,
                                      interpret=interpret)
    w = (_unpack_planar(w_re, lead, bf, n_out) +
         1j * _unpack_planar(w_im, lead, bf, n_out))
    return w.astype(rs.dtype)


@partial(jax.jit, static_argnames=("power_iters", "eps_rel", "interpret"))
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
    kernel = partial(_mvdr_kernel, n, power_iters, eps_rel)
    return _run_entry_major(kernel, n, n, rs, rn, interpret)


@partial(jax.jit, static_argnames=("power_iters", "eps_rel", "interpret"))
def gevd_power_pallas(rs: jax.Array,
                      rn: jax.Array,
                      power_iters: int = 15,
                      eps_rel: float = 1e-6,
                      interpret: bool = False) -> jax.Array:
    """GEV/max-SNR weights: principal generalized eigenvector of
    (Rs, Rn) per bin via power iteration on Rn^{-1} Rs.

    Matches ``ops.linalg.solve_pevd(rs, rn)`` up to per-bin phase
    (eigenvector phase is solver-arbitrary; this kernel anchors channel
    0 real-positive) with the same v^H Rn v = 1 normalization.
    """
    n = rs.shape[-1]
    kernel = partial(_gevd_kernel, n, power_iters, eps_rel)
    return _run_entry_major(kernel, n, n, rs, rn, interpret)


@partial(jax.jit, static_argnames=("beta", "eps_rel", "return_powers",
                                   "interpret"))
def pmwf_solve_pallas(rs: jax.Array,
                      rn: jax.Array,
                      beta: float = 0.0,
                      eps_rel: float = 1e-6,
                      return_powers: bool = False,
                      interpret: bool = False):
    """PMWF weight matrix W = Rn^{-1} Rs / (beta + trace) per bin.

    Returns (..., N, N); with ``return_powers`` also the per-channel
    SNR powers (ps, pn), each (..., N) real — feed them to
    ``enhance.beamformer.pmwf_select_powers`` instead of the einsum
    selection (the in-kernel powers make the tiny-N XLA einsums in
    pmwf_select_ref unnecessary).
    """
    n = rs.shape[-1]
    kernel = partial(_pmwf_kernel, n, beta, eps_rel, return_powers)
    if not return_powers:
        out = _run_entry_major(kernel, n, n * n, rs, rn, interpret)
        return out.reshape(*rs.shape[:-2], n, n)
    args, lead, bf = _pack_entry_major(rs, rn, n)
    w_re, w_im, ps, pn = _weights_pallas_flat(
        kernel, (n * n, n * n, n, n), *args, interpret=interpret)
    w = (_unpack_planar(w_re, lead, bf, n * n) +
         1j * _unpack_planar(w_im, lead, bf, n * n)).astype(rs.dtype)
    return (w.reshape(*rs.shape[:-2], n, n),
            _unpack_planar(ps, lead, bf, n),
            _unpack_planar(pn, lead, bf, n))


@partial(jax.jit, static_argnames=("eps_rel", "interpret"))
def capon_pallas(steer: jax.Array,
                 r: jax.Array,
                 eps_rel: float = 1e-6,
                 interpret: bool = False) -> jax.Array:
    """Capon/MPDR weights for a given steer: w = R^{-1}d / (d^H R^{-1}d),
    lane-batched over bins.  steer (..., N) complex, r (..., N, N)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    n = r.shape[-1]
    lead = r.shape[:-2]
    bf = int(np.prod(lead)) if lead else 1
    tile = _ROWS * 128

    def pack(mat, width):
        flat = mat.reshape(bf, width)
        em = jnp.transpose(flat, (1, 0))
        pad = (-bf) % tile
        if pad:
            em = jnp.pad(em, ((0, 0), (0, pad)))
        return em.reshape(width, -1, _ROWS, 128)

    args = [pack(jnp.real(steer).astype(jnp.float32), n),
            pack(jnp.imag(steer).astype(jnp.float32), n),
            pack(jnp.real(r).astype(jnp.float32), n * n),
            pack(jnp.imag(r).astype(jnp.float32), n * n)]
    nn, nb, rows, lanes = args[2].shape
    d_spec = pl.BlockSpec((n, 1, rows, lanes), lambda i: (0, i, 0, 0),
                          memory_space=pltpu.VMEM)
    r_spec = pl.BlockSpec((nn, 1, rows, lanes), lambda i: (0, i, 0, 0),
                          memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((n, 1, rows, lanes), lambda i: (0, i, 0, 0),
                            memory_space=pltpu.VMEM)
    w_re, w_im = pl.pallas_call(
        partial(_capon_kernel, n, eps_rel),
        grid=(nb,),
        in_specs=[d_spec, d_spec, r_spec, r_spec],
        out_specs=[out_spec, out_spec],
        out_shape=[
            jax.ShapeDtypeStruct((n, nb, rows, lanes), jnp.float32),
            jax.ShapeDtypeStruct((n, nb, rows, lanes), jnp.float32),
        ],
        interpret=interpret,
    )(*args)
    w = (w_re + 1j * w_im).reshape(n, -1)[:, :bf]
    return jnp.transpose(w, (1, 0)).reshape(*lead, n).astype(r.dtype)
