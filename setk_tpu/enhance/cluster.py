"""CGMM / CACGMM spatial clustering as jitted EM loops.

Math parity: /root/reference/scripts/sptk/libs/cluster.py (Higuchi CGMM,
Ito CACGMM) — the same regularized-covariance updates (eigenvalues scaled
by their max and floored, /root/reference/scripts/sptk/libs/cluster.py:
94-135), posterior/log-pdf formulas and K=2 covariance initialization.
Redesigned for TPU execution: all classes K and bins F (plus any leading
batch axes) are batched into single einsum/eigh kernels, the EM iteration
runs under ``lax.scan`` with a Q-history output, and the frequency
permutation alignment (inherently sequential Hungarian passes) stays on
host.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from setk_tpu.utils.common import EPSILON, GRAM_PRECISION
from setk_tpu.ops.linalg import hermitianize, regularized_inverse

__all__ = [
    "cgmm_em", "cacgmm_em", "norm_observation", "permu_aligner",
    "CgmmState", "CacgmmState"
]


def norm_observation(mat, axis=-1, eps=EPSILON):
    """L2-normalize observation vectors along ``axis``."""
    denorm = jnp.maximum(
        jnp.linalg.norm(mat, axis=axis, keepdims=True), eps)
    return mat / denorm


def _posterior(log_pdf, alpha, frame_mask=None):
    """Softmax posterior over the class axis (first), with priors; also
    returns the reference's Q statistic (mean log marginal likelihood,
    over valid frames when ``frame_mask`` is given).

    The marginal uses a max-shifted logsumexp: on real recordings the
    near-silent bins push -M log(phi) past float32's exp range (~88), so
    a raw exp overflows Q to +inf (the float64 reference never hits
    this, /root/reference/scripts/sptk/libs/cluster.py:261-287)."""
    mx = jnp.max(log_pdf, axis=0, keepdims=True)
    num = jnp.exp(log_pdf - mx) * alpha[..., None]
    den = jnp.maximum(jnp.sum(num, axis=0, keepdims=True), EPSILON)
    log_marg = mx[0] + jnp.log(den[0])
    # clamp: f32 rounding can give num/den = 1 + ulp; a gamma of
    # 1.0000001 makes the downstream (1 - mask) noise weights NEGATIVE
    # on the loudest frames and the noise covariance indefinite far
    # beyond any loading (-4.7e-4 relative measured -> Cholesky NaN)
    post = jnp.minimum(num / den, 1.0)
    if frame_mask is None:
        q = jnp.mean(log_marg)
    else:
        fm = jnp.broadcast_to(frame_mask, log_marg.shape)
        q = jnp.sum(log_marg * fm) / jnp.maximum(jnp.sum(fm), 1.0)
    return post, q


def _weighted_covar(obs, weight):
    """R = sum_t w[k,...,t] z[...,t] z[...,t]^H — shared EM covariance
    update: obs (..., F, M, T) + weight (K, ..., F, T) -> (K, ..., F, M, M).

    Routed through the VPU pair-loop formulation (beamformer.covar_stats)
    rather than an einsum that lowers to MXU-hostile tiny matmuls.
    """
    from setk_tpu.enhance.beamformer import covar_stats
    num, _ = covar_stats(obs[None], weight)
    return num


# --------------------------------------------------------------------------
# CGMM
# --------------------------------------------------------------------------

CgmmState = tuple  # (phi, covar, alpha, gamma)


def _cgmm_quad(obs, r_inv):
    """phi-style quadratic z^H R^{-1} z: (K, F, T).

    Kept as an einsum: inside the EM scan XLA fuses it well (203 ms for
    20 batched iterations), while a statically-unrolled M^2 pair loop —
    despite winning 25x in isolation — bloats the scan body enough to
    slow the fused program ~1.7x and multiply compile time.

    Second negative result (chained timing, B=8 F=257 M=6 T=250): an
    eigenbasis-projection predict (quad = sum_y w_y^{-1} |v_y^H z|^2
    with statically unrolled projections, no materialized R^{-1}) was
    1.6x SLOWER than this einsum form for the whole 20-iteration scan
    (69 ms vs 42 ms) — same fusion story, measure in context.
    """
    quad = jnp.einsum("...xt,k...xy,...yt->k...t", jnp.conj(obs), r_inv, obs)
    return jnp.maximum(jnp.abs(quad), EPSILON)


def _quad_pairs(obs, r_inv):
    """z^H R^{-1} z as a statically-unrolled M^2 pair loop (VPU form).

    For ISOLATED calls (the EM init) this wins ~25x over the einsum
    lowering; inside the EM scan the einsum fuses better — use
    _cgmm_quad there (its docstring records both measurements)."""
    m = obs.shape[-2]
    quad = None
    for i in range(m):
        zi = obs[..., i, :]
        d = jnp.real(r_inv[..., i, i])[..., None] * (
            jnp.real(zi) ** 2 + jnp.imag(zi) ** 2)
        quad = d if quad is None else quad + d
        for j in range(i + 1, m):
            p = jnp.conj(zi) * obs[..., j, :]
            rij = r_inv[..., i, j][..., None]
            quad = quad + 2.0 * (jnp.real(rij) * jnp.real(p) -
                                 jnp.imag(rij) * jnp.imag(p))
    return jnp.maximum(quad, EPSILON)


def _cgmm_predict(obs, phi, covar, alpha, frame_mask=None, logdet=None):
    m = obs.shape[-2]
    if logdet is None:
        _, logdet = regularized_inverse(covar, return_logdet=True)
    log_pdf = -m * jnp.log(phi) - logdet[..., None]
    return _posterior(log_pdf, alpha, frame_mask)


def cgmm_em(obs: jax.Array,
            num_classes: int,
            num_iters: int = 20,
            gamma_init: jax.Array | None = None,
            update_alpha: bool = False,
            key: jax.Array | None = None,
            state: dict | None = None,
            return_state: bool = False,
            frame_mask: jax.Array | None = None,
            use_fused: bool | None = None,
            sweeps: int | None = None):
    """CGMM EM over obs (F, M, T) (leading batch axes allowed).

    Returns (gamma (K, F, T), q_history (num_iters,)) — plus the model
    state dict {phi, covar, alpha} when ``return_state`` is set, which
    can be fed back via ``state`` to resume training (the reference's
    pickled-trainer resume, /root/reference/scripts/sptk/libs/
    cluster.py:449-453).  K=2 without an initial gamma uses the Higuchi
    init (Rs = sample covariance, Rn = I), otherwise random or provided
    gammas.
    Parity: /root/reference/scripts/sptk/libs/cluster.py:396-465.
    ``sweeps`` (fused TPU path only) sets the in-kernel Jacobi sweep
    count of the regularized inverse (default 6 = the fused-vs-XLA
    parity configuration; 3 is measured-safe for mask seeding and saves
    ~10% of the EM step — doc/KERNELS.md round-4 attribution).
    """
    obs = jnp.asarray(obs)
    *batch, f, m, t = obs.shape
    if state is not None:
        phi = jnp.asarray(state["phi"])
        covar = jnp.asarray(state["covar"])
        alpha = jnp.asarray(state["alpha"])
        gamma, _ = _cgmm_predict(obs, phi, covar, alpha)
        return _cgmm_scan(obs, phi, covar, alpha, gamma, m, num_iters,
                          update_alpha, return_state,
                          frame_mask=frame_mask)
    fm = None if frame_mask is None else jnp.asarray(frame_mask)
    if use_fused is None:
        from setk_tpu.utils.hostdev import tpu_target
        use_fused = tpu_target()
    if use_fused and gamma_init is None and num_classes == 2:
        # K=2 Higuchi covariance init IN-KERNEL: the XLA entry path
        # (covar_stats + Jacobi inverse + pair-loop quad + predict, each
        # its own dispatch) measured ~6.7 ms/call at B=32 x 4 s — the
        # entire CGMM-vs-CACGMM gap, paid 3x per WPD call
        # (benchmarks/profile_em5.py r05)
        from setk_tpu.ops.pallas.cacgmm_em import (cgmm_em_pallas,
                                                   cacgmm_fused_supported)
        if cacgmm_fused_supported(obs.shape, num_classes, num_iters,
                                  init=True):
            kw = {} if sweeps is None else {"sweeps": sweeps}
            return cgmm_em_pallas(obs, None, None, num_iters,
                                  update_alpha=update_alpha,
                                  frame_mask=fm, init="higuchi",
                                  return_state=return_state, **kw)
    if gamma_init is not None:
        gamma = jnp.asarray(gamma_init)
        g = gamma if fm is None else gamma * fm
        den = jnp.maximum(jnp.sum(g, -1, keepdims=True), EPSILON)
        covar = _weighted_covar(obs, g) / den[..., None]
    elif num_classes == 2:
        # sample covariance through the routed pair-loop/Pallas path —
        # the einsum lowering (batched tiny matmuls) cost ~5 ms of the
        # measured 5.0 ms CGMM init overhead (profile_em5 r05)
        if fm is None:
            w0 = jnp.ones((1, *batch, f, t))
            rs = _weighted_covar(obs, w0)[0] / t
        else:
            w0 = jnp.broadcast_to(fm, (*batch, f, t))[None]
            rs = (_weighted_covar(obs, w0)[0] /
                  jnp.maximum(jnp.sum(fm, -1), 1.0)[..., None, None])
        rn = jnp.broadcast_to(jnp.eye(m, dtype=obs.dtype), rs.shape)
        covar = jnp.stack([rs, rn])
        gamma = None
    else:
        if key is None:
            key = jax.random.PRNGKey(0)
        gamma = jax.random.uniform(key, (num_classes, *batch, f, t))
        gamma = gamma / jnp.sum(gamma, 0, keepdims=True)
        g = gamma if fm is None else gamma * fm
        den = jnp.maximum(jnp.sum(g, -1, keepdims=True), EPSILON)
        covar = _weighted_covar(obs, g) / den[..., None]
    # init phi from R^{-1}: ONE shared inverse (the predict only needs
    # its logdet) + the isolated-call pair-loop quad
    r_inv, logdet0 = regularized_inverse(covar, return_logdet=True)
    phi = _quad_pairs(obs, r_inv) / m
    alpha = jnp.full((num_classes, *batch, f), 1.0 / num_classes)
    gamma, _ = _cgmm_predict(obs, phi, covar, alpha, logdet=logdet0)
    # TPU: the whole EM loop runs inside ONE Pallas kernel, same
    # machinery as the fused CACGMM (ops/pallas/cacgmm_em.py, model
    # switch "cg"); state resume stays on the XLA path (the kernel
    # re-initializes alpha to the uniform prior).
    if use_fused is None:
        from setk_tpu.utils.hostdev import tpu_target
        use_fused = tpu_target()
    if use_fused:
        from setk_tpu.ops.pallas.cacgmm_em import (cgmm_em_pallas,
                                                   cacgmm_fused_supported)
        if cacgmm_fused_supported(obs.shape, num_classes, num_iters):
            gamma = jnp.broadcast_to(gamma, (num_classes, *batch, f, t))
            phi = jnp.broadcast_to(phi, (num_classes, *batch, f, t))
            kw = {} if sweeps is None else {"sweeps": sweeps}
            return cgmm_em_pallas(obs, gamma, phi, num_iters,
                                  update_alpha=update_alpha,
                                  frame_mask=fm,
                                  return_state=return_state, **kw)
    return _cgmm_scan(obs, phi, covar, alpha, gamma, m, num_iters,
                      update_alpha, return_state, frame_mask=frame_mask)


def _cgmm_scan(obs, phi, covar, alpha, gamma, m, num_iters, update_alpha,
               return_state, frame_mask=None):
    fm = None if frame_mask is None else jnp.asarray(frame_mask)

    def step(carry, _):
        phi, covar, alpha, gamma = carry
        g = gamma if fm is None else gamma * fm
        # M-step: R and phi (reference order: update then predict)
        den = jnp.maximum(jnp.sum(g, -1, keepdims=True), EPSILON)
        covar = _weighted_covar(obs, g * m / phi) / den[..., None]
        # one shared inverse: the predict below only consumes its logdet
        r_inv, logdet = regularized_inverse(covar, return_logdet=True)
        phi = _cgmm_quad(obs, r_inv) / m
        if update_alpha:
            if fm is None:
                alpha = jnp.mean(gamma, -1)
            else:
                alpha = jnp.sum(g, -1) / jnp.maximum(
                    jnp.sum(jnp.broadcast_to(fm, gamma.shape), -1), 1.0)
        # E-step
        gamma, q = _cgmm_predict(obs, phi, covar, alpha, fm, logdet=logdet)
        return (phi, covar, alpha, gamma), q

    (phi, covar, alpha, gamma), q_hist = jax.lax.scan(
        step, (phi, covar, alpha, gamma), None, length=num_iters)
    if return_state:
        return gamma, q_hist, {"phi": phi, "covar": covar, "alpha": alpha}
    return gamma, q_hist


# --------------------------------------------------------------------------
# CACGMM
# --------------------------------------------------------------------------

CacgmmState = tuple  # (covar, alpha, kernel, gamma)


def _cacgmm_predict(obs, covar, alpha, frame_mask=None):
    m = obs.shape[-2]
    b_inv, logdet = regularized_inverse(covar, return_logdet=True)
    kernel = _cgmm_quad(obs, b_inv)
    log_pdf = -m * jnp.log(kernel) - logdet[..., None]
    gamma, q = _posterior(log_pdf, alpha, frame_mask)
    return gamma, kernel, q


def cacgmm_em(obs: jax.Array,
              num_classes: int,
              num_iters: int = 20,
              gamma_init: jax.Array | None = None,
              cgmm_init: bool = False,
              update_alpha: bool = True,
              key: jax.Array | None = None,
              state: dict | None = None,
              return_state: bool = False,
              frame_mask: jax.Array | None = None,
              use_fused: bool | None = None,
              sweeps: int | None = None):
    """CACGMM EM over obs (F, M, T); observations are L2-normalized over
    the mic axis internally (as the reference does over axis=0 of
    M x F x T, /root/reference/scripts/sptk/libs/cluster.py:489).

    Returns (gamma (K, F, T), q_history) — plus the model state dict
    {covar, alpha} when ``return_state`` is set, resumable via ``state``
    (pickled-trainer parity, /root/reference/scripts/sptk/libs/
    cluster.py:519-523).
    """
    obs = norm_observation(jnp.asarray(obs), axis=-2)
    *batch, f, m, t = obs.shape
    alpha = jnp.full((num_classes, *batch, f), 1.0 / num_classes)

    if use_fused is None:
        from setk_tpu.utils.hostdev import tpu_target
        use_fused = tpu_target() and state is None
    if use_fused and state is None and cgmm_init and num_classes == 2 \
            and gamma_init is None:
        # covariance init in-kernel (see the cgmm_em dispatch note)
        from setk_tpu.ops.pallas.cacgmm_em import (cacgmm_em_pallas,
                                                   cacgmm_fused_supported)
        if cacgmm_fused_supported(obs.shape, num_classes, num_iters,
                                  init=True):
            kw = {} if sweeps is None else {"sweeps": sweeps}
            fm0 = None if frame_mask is None else jnp.asarray(frame_mask)
            return cacgmm_em_pallas(obs, None, None, num_iters,
                                    update_alpha=update_alpha,
                                    frame_mask=fm0, init="higuchi",
                                    return_state=return_state, **kw)
    if state is not None:
        covar = jnp.asarray(state["covar"])
        alpha = jnp.asarray(state["alpha"])
        gamma, kernel, _ = _cacgmm_predict(obs, covar, alpha)
    elif cgmm_init and num_classes == 2:
        # routed pair-loop/Pallas covariance (see the cgmm_em init note)
        if frame_mask is None:
            rs = _weighted_covar(obs, jnp.ones((1, *batch, f, t)))[0] / t
        else:
            fm0 = jnp.asarray(frame_mask)
            w0 = jnp.broadcast_to(fm0, (*batch, f, t))[None]
            rs = (_weighted_covar(obs, w0)[0] /
                  jnp.maximum(jnp.sum(fm0, -1), 1.0)[..., None, None])
        rn = jnp.broadcast_to(jnp.eye(m, dtype=obs.dtype), rs.shape)
        covar = jnp.stack([rs, rn])
        gamma, kernel, _ = _cacgmm_predict(obs, covar, alpha)
    else:
        if gamma_init is None:
            if key is None:
                key = jax.random.PRNGKey(0)
            gamma = jax.random.uniform(key, (num_classes, *batch, f, t))
            gamma = gamma / jnp.sum(gamma, 0, keepdims=True)
        else:
            gamma = jnp.asarray(gamma_init)
        kernel = jnp.ones((num_classes, *batch, f, t))

    covar0 = jnp.zeros((num_classes, *batch, f, m, m), dtype=obs.dtype)
    fm = None if frame_mask is None else jnp.asarray(frame_mask)

    # TPU: the whole EM loop runs inside ONE Pallas kernel (observations
    # stay VMEM-resident across all iterations; ~5x over the XLA scan —
    # ops/pallas/cacgmm_em.py).  State resume stays on the XLA path
    # (the kernel initializes alpha to the uniform prior).
    if use_fused is None:
        from setk_tpu.utils.hostdev import tpu_target
        use_fused = tpu_target() and state is None
    if use_fused and state is None:
        from setk_tpu.ops.pallas.cacgmm_em import (cacgmm_em_pallas,
                                                   cacgmm_fused_supported)
        if cacgmm_fused_supported(obs.shape, num_classes, num_iters):
            gamma = jnp.broadcast_to(gamma, (num_classes, *batch, f, t))
            kernel = jnp.broadcast_to(kernel, (num_classes, *batch, f, t))
            kw = {} if sweeps is None else {"sweeps": sweeps}
            return cacgmm_em_pallas(obs, gamma, kernel, num_iters,
                                    update_alpha=update_alpha,
                                    frame_mask=fm,
                                    return_state=return_state, **kw)

    def step(carry, _):
        gamma, kernel, alpha, _ = carry
        g = gamma if fm is None else gamma * fm
        # M-step: B update with kernel weighting
        den = jnp.maximum(jnp.sum(g, -1, keepdims=True), EPSILON)
        covar = m * _weighted_covar(obs, g / kernel) / den[..., None]
        if update_alpha:
            if fm is None:
                alpha = jnp.mean(gamma, -1)
            else:
                alpha = jnp.sum(g, -1) / jnp.maximum(
                    jnp.sum(jnp.broadcast_to(fm, gamma.shape), -1), 1.0)
        # E-step
        gamma, kernel, q = _cacgmm_predict(obs, covar, alpha, fm)
        return (gamma, kernel, alpha, covar), q

    (gamma, _, alpha, covar), q_hist = jax.lax.scan(
        step, (gamma, kernel, alpha, covar0), None, length=num_iters)
    if return_state:
        return gamma, q_hist, {"covar": covar, "alpha": alpha}
    return gamma, q_hist


# --------------------------------------------------------------------------
# Frequency permutation alignment (host side)
# --------------------------------------------------------------------------

# per-band alignment schedules (iterations, begin, end) keyed by F;
# same sweep plans as pb_bss-style alignment used by the reference
# (/root/reference/scripts/sptk/libs/cluster.py:28-36)
_BAND_PLANS = {
    257: [[20, 70, 170], [2, 90, 190], [2, 50, 150], [2, 110, 210],
          [2, 30, 130], [2, 130, 230], [2, 0, 110], [2, 150, 257]],
    513: [[20, 100, 200], [2, 120, 220], [2, 80, 180], [2, 140, 240],
          [2, 60, 160], [2, 160, 260], [2, 40, 140], [2, 180, 280],
          [2, 0, 120], [2, 200, 300], [2, 220, 320], [2, 240, 340],
          [2, 260, 360], [2, 280, 380], [2, 300, 400], [2, 320, 420],
          [2, 340, 440], [2, 360, 460], [2, 380, 480], [2, 400, 513]]
}


def _norm_np(mat, axis):
    den = np.maximum(np.linalg.norm(mat, axis=axis, keepdims=True), EPSILON)
    return mat / den


def permu_aligner(masks, transpose=False):
    """Greedy per-band Hungarian alignment of cluster masks over frequency.

    masks: K x T x F (or K x F x T with transpose=True).  Host-side numpy:
    the band sweeps are sequential with data-dependent early exit, a poor
    fit for compiled execution and negligible next to the EM itself.
    Parity: /root/reference/scripts/sptk/libs/cluster.py:48-91.
    """
    from scipy.optimize import linear_sum_assignment
    masks = np.asarray(masks)
    if masks.ndim != 3:
        raise RuntimeError("Expect 3D TF-masks, K x T x F or K x F x T")
    if transpose:
        masks = np.transpose(masks, (0, 2, 1))
    num_k, _, num_f = masks.shape
    feature = _norm_np(masks.copy(), axis=1)
    mapping = np.stack([np.full(num_f, k, dtype=np.int64)
                        for k in range(num_k)])
    if num_f not in _BAND_PLANS:
        raise ValueError(f"Unsupported num_bins: {num_f}")
    for itr, beg, end in _BAND_PLANS[num_f]:
        for _ in range(itr):
            centroid = _norm_np(np.mean(feature[..., beg:end], axis=-1),
                                axis=-1)
            changed = False
            for f in range(beg, end):
                score = centroid @ _norm_np(feature[..., f], axis=-1).T
                index, permu = linear_sum_assignment(score, maximize=True)
                if np.any(permu != index):
                    feature[..., f] = feature[permu, :, f]
                    mapping[..., f] = mapping[permu, f]
                    changed = True
            if not changed:
                break
    aligned = np.zeros_like(masks)
    for f in range(num_f):
        aligned[..., f] = masks[mapping[..., f], :, f]
    return aligned if not transpose else np.transpose(aligned, (0, 2, 1))
