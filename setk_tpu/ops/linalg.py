"""Batched Hermitian linear algebra for per-frequency-bin solves.

The reference does these per bin with LAPACK (numpy eigh / scipy
generalized eigh, /root/reference/scripts/sptk/libs/beamformer.py:31-63;
cheev/chegv in /root/reference/include/cblas-cpl-wrappers.h:146-194).  Here
every op is batched over arbitrary leading axes (F, or K x F) so XLA sees
one large batched kernel instead of F host round-trips.

The generalized Hermitian EVD — absent from XLA — is reduced to a standard
EVD by Cholesky whitening with graduated diagonal loading, replacing the
reference's per-bin eigh->eig exception fallback
(/root/reference/scripts/sptk/libs/beamformer.py:51-62) with a branch-free
regularization suited to compiled execution.
"""

import jax
import jax.numpy as jnp

from setk_tpu.utils.common import EPSILON

__all__ = [
    "hermitianize", "eigh", "principal_eigvec", "solve_pevd",
    "generalized_eigh", "regularized_inverse", "power_iteration",
    "equilibrated_hermitian_solve"
]

def eigh(mat: jax.Array):
    """Batched Hermitian EVD.

    Currently delegates to jnp.linalg.eigh everywhere: on TPU the XLA
    eigh was measured at 2.5 ms for an (8*257, 6, 6) batch while the
    vectorized Jacobi alternative (ops/jacobi.py) pays 35x in layout
    traffic from its per-rotation row/column updates.  The dispatcher
    stays as the single seam for future kernel specialization.
    """
    return jnp.linalg.eigh(mat)


def hermitianize(mat: jax.Array) -> jax.Array:
    """(R + R^H) / 2 over the trailing two axes."""
    return 0.5 * (mat + jnp.conj(jnp.swapaxes(mat, -1, -2)))


def _diag_load(mat: jax.Array, eps_rel: float) -> jax.Array:
    """Add eps_rel * mean(diag) * I (scale-invariant loading)."""
    n = mat.shape[-1]
    tr = jnp.trace(mat, axis1=-2, axis2=-1).real / n
    eye = jnp.eye(n, dtype=mat.dtype)
    return mat + (eps_rel * tr + EPSILON)[..., None, None] * eye


def _unrolled_cholesky_solve(a: jax.Array, rhs: jax.Array) -> jax.Array:
    """Statically-unrolled Cholesky solve for tiny Hermitian systems.

    NEGATIVE RESULT, kept as documentation (like ops/jacobi.py): although
    isolated tiny-system solves suffer XLA's per-bin lowering, inside the
    fused MVDR bench step this unrolled form is consistently ~27% SLOWER
    than jnp.linalg.cholesky + solve_triangular (83 ms vs 65 ms
    whole-pipeline, interleaved same-process A/B at B=128 F=257 N=6) —
    the scalarized graph defeats XLA's cross-stage fusion, the same
    in-context lesson as the EM quad einsum (enhance/cluster._cgmm_quad).
    Not dispatched; hermitian_solve uses the XLA path everywhere.
    a: (..., N, N) loaded Hermitian; rhs: (..., N, K) with K static.
    """
    n = a.shape[-1]
    k = rhs.shape[-1]
    low = [[None] * n for _ in range(n)]
    for j in range(n):
        d = a[..., j, j].real - sum(
            (low[j][q].real**2 + low[j][q].imag**2) for q in range(j))
        inv_d = jax.lax.rsqrt(jnp.maximum(d, EPSILON))
        low[j][j] = inv_d  # store 1/L[j][j] (real) — only divisions used
        for i in range(j + 1, n):
            s = a[..., i, j]
            for q in range(j):
                s = s - low[i][q] * jnp.conj(low[j][q])
            low[i][j] = s * inv_d
    cols = []
    for c in range(k):
        # forward: L y = b
        y = [None] * n
        for i in range(n):
            s = rhs[..., i, c]
            for q in range(i):
                s = s - low[i][q] * y[q]
            y[i] = s * low[i][i]
        # backward: L^H x = y
        x = [None] * n
        for i in reversed(range(n)):
            s = y[i]
            for q in range(i + 1, n):
                s = s - jnp.conj(low[q][i]) * x[q]
            x[i] = s * low[i][i]
        cols.append(jnp.stack(x, axis=-1))
    return jnp.stack(cols, axis=-1)


def hermitian_solve(a: jax.Array, b: jax.Array,
                    eps_rel: float = 1e-6,
                    use_pallas: bool | None = None,
                    assume_hermitian: bool = False) -> jax.Array:
    """Solve a x = b for Hermitian (PSD) ``a`` via Cholesky + loading.

    On TPU the batched LU behind jnp.linalg.solve costs ~10x more than a
    Cholesky factorization for the small (N <= 8) per-bin systems this
    domain produces; all our system matrices are (mask-weighted)
    covariances, so PD-ness under light diagonal loading is guaranteed.
    (A statically-unrolled variant was measured slower in context — see
    ``_unrolled_cholesky_solve``.)

    For medium systems (16 <= N <= 128, e.g. WPE's N*taps normal
    equations) the TPU backend dispatches to the lane-batched Pallas
    Cholesky (ops/pallas/cholesky.py) — XLA's batched complex Cholesky
    collapses at that shape (measured 170 ms -> 15 ms for 8k 60x60
    systems, 85% of a WPE iteration).
    b: (..., N) vector or (..., N, K) matrix right-hand side.
    """
    n = a.shape[-1]
    vec = b.ndim == a.ndim - 1
    rhs = b[..., None] if vec else b
    if use_pallas is None:
        from setk_tpu.utils.hostdev import tpu_target
        use_pallas = tpu_target() and 16 <= n <= 128
    if use_pallas:
        from setk_tpu.ops.pallas.cholesky import hermitian_solve_lanes_pallas
        x = hermitian_solve_lanes_pallas(a, rhs, eps_rel=eps_rel,
                                         assume_hermitian=assume_hermitian)
        return x[..., 0] if vec else x
    loaded = _diag_load(a if assume_hermitian else hermitianize(a), eps_rel)
    chol = jnp.linalg.cholesky(loaded)
    y = jax.scipy.linalg.solve_triangular(chol, rhs, lower=True)
    x = jax.scipy.linalg.solve_triangular(
        jnp.conj(jnp.swapaxes(chol, -1, -2)), y, lower=False)
    return x[..., 0] if vec else x


def equilibrated_hermitian_solve(a: jax.Array, b: jax.Array,
                                 eps_rel: float = 1e-6) -> jax.Array:
    """``hermitian_solve`` after symmetric Jacobi equilibration.

    WPD's lambda-weighted Grams (enhance/wpe.wpd) carry a 1/lambda
    dynamic range of up to ~1/EPSILON ~ 8e6 across rows when the
    enhanced power hits its floor on silent frames; their f32 Cholesky
    condition exceeds representable precision and NaNs even under
    diagonal loading (the float64 per-utterance reference,
    /root/reference/scripts/sptk/libs/wpe.py:146-177, never sees this).
    Scaling A -> D A D with D = diag(A)^{-1/2} is EXACT math (the
    solution is unscaled afterwards) and restores a unit diagonal, so
    the relative diag loading inside ``hermitian_solve`` acts per-row.
    All-zero rows (bucketed zero padding) keep scale 1 and solve to ~0.

    The loading floor self-scales with the system size: f32 rounding of
    an N-row Gram perturbs the equilibrated spectrum by O(N * eps)
    (measured -1.2e-6 at N=60 on a WPD torture input, NaN under a flat
    1e-6 load), so eps_rel is clamped to >= 4 * N * f32_eps.
    """
    vec = b.ndim == a.ndim - 1
    rhs = b[..., None] if vec else b
    eps_rel = max(eps_rel, 4.0 * a.shape[-1] * float(EPSILON))
    diag = jnp.abs(jnp.diagonal(a, axis1=-2, axis2=-1))
    d = jnp.where(diag > 0, jax.lax.rsqrt(jnp.maximum(diag, 1e-30)), 1.0)
    a2 = a * d[..., :, None] * d[..., None, :]
    x2 = hermitian_solve(a2, rhs * d[..., :, None], eps_rel=eps_rel)
    x = x2 * d[..., :, None]
    return x[..., 0] if vec else x


def principal_eigvec(mat: jax.Array) -> jax.Array:
    """Principal eigenvector of batched Hermitian matrices ``(..., N, N)``.

    Matches np.linalg.eigh's convention (returns the eigenvector of the
    largest eigenvalue, unit L2 norm, phase fixed by the solver).
    """
    _, vecs = eigh(mat)
    return vecs[..., :, -1]


def generalized_eigh(a: jax.Array,
                     b: jax.Array,
                     eps_rel: float = 1e-6):
    """Generalized Hermitian EVD ``a v = w b v`` via Cholesky whitening.

    Returns (w, v) with eigenvalues ascending and eigenvectors normalized
    so ``v^H b v = I`` — the same normalization scipy.linalg.eigh(a, b)
    uses (eigenvectors match up to per-vector phase).
    """
    b = _diag_load(hermitianize(b), eps_rel)
    chol = jnp.linalg.cholesky(b)
    # C = L^{-1} a L^{-H}: with X = L^{-1} a (a Hermitian), C = L^{-1} X^H
    li_a = jax.scipy.linalg.solve_triangular(chol, hermitianize(a),
                                             lower=True)
    c = jax.scipy.linalg.solve_triangular(chol,
                                          jnp.conj(jnp.swapaxes(li_a, -1, -2)),
                                          lower=True)
    w, u = eigh(hermitianize(c))
    # v = L^{-H} u
    v = jax.scipy.linalg.solve_triangular(jnp.conj(jnp.swapaxes(chol, -1, -2)),
                                          u, lower=False)
    return w, v


def solve_pevd(rs: jax.Array,
               rn: jax.Array | None = None,
               eps_rel: float = 1e-6) -> jax.Array:
    """Principal (generalized) eigenvector per batch element.

    Parity with /root/reference/scripts/sptk/libs/beamformer.py:31-63:
    ``rn=None`` gives the plain principal eigenvector of ``rs``; otherwise
    the max generalized eigenvector of (rs, rn).
    """
    if rn is None:
        return principal_eigvec(hermitianize(rs))
    _, v = generalized_eigh(rs, rn, eps_rel=eps_rel)
    return v[..., :, -1]


def regularized_inverse(covar: jax.Array, return_logdet: bool = False,
                        use_pallas: bool | None = None):
    """Eigenvalue-floored inverse of batched Hermitian matrices.

    The reference's Covariance object scales eigenvalues by their max and
    floors at EPSILON before inverting
    (/root/reference/scripts/sptk/libs/cluster.py:94-135); this reproduces
    that regularization (and its log-determinant of the *scaled* spectrum)
    in one batched eigh.

    On the TPU target with M <= 8 this dispatches to the lane-batched
    Jacobi EVD kernel (ops/pallas/eigh_small.py) — XLA's batched complex
    eigh costs 1.35 ms per 4k 6x6 call and dominates the clustering EM.
    """
    m = covar.shape[-1]
    if use_pallas is None:
        from setk_tpu.utils.hostdev import tpu_target
        use_pallas = tpu_target() and m <= 8
    if use_pallas:
        from setk_tpu.ops.pallas.eigh_small import regularized_inverse_pallas
        return regularized_inverse_pallas(covar, return_logdet=return_logdet)
    w, v = eigh(hermitianize(covar))
    w = w / jnp.maximum(jnp.max(w, axis=-1, keepdims=True), EPSILON)
    w = jnp.maximum(w, EPSILON)
    inv = jnp.einsum("...xy,...y,...zy->...xz", v, 1.0 / w, jnp.conj(v))
    if return_logdet:
        logdet = jnp.sum(jnp.log(w), axis=-1)
        return inv, logdet
    return inv


def power_iteration(mat: jax.Array,
                    num_iters: int = 20,
                    init: jax.Array | None = None) -> jax.Array:
    """Principal eigenvector by fixed-iteration power method.

    A cheap MXU/VPU-only alternative to eigh for well-separated spectra
    (e.g. rank-1-dominated speech PSDs); fully batched and differentiable.
    """
    n = mat.shape[-1]
    if init is None:
        v = jnp.ones(mat.shape[:-1], dtype=mat.dtype)
        # de-symmetrize: ramp phase avoids starting orthogonal to p.e.v.
        ramp = jnp.arange(1, n + 1, dtype=jnp.float32) / n
        v = v * ramp.astype(mat.dtype)
    else:
        v = init

    def body(_, v):
        # explicit broadcast matvec: tiny-N einsum would lower to an
        # MXU-hostile batched dot
        v = jnp.sum(mat * v[..., None, :], axis=-1)
        return v / jnp.maximum(
            jnp.linalg.norm(v, axis=-1, keepdims=True), EPSILON)

    v = jax.lax.fori_loop(0, num_iters, body, v)
    return v
