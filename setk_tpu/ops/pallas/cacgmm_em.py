"""Pallas TPU kernel: the ENTIRE CGMM / CACGMM EM loop fused in VMEM.

The XLA EM (enhance/cluster.cacgmm_em) runs each iteration as a
lax.scan step of separate covariance / Jacobi-inverse / quadratic /
posterior stages; every stage round-trips its operands through HBM and
each scan step pays the runtime's fixed step cost, so 20 iterations at
B=8 measure ~20 ms against a ~2 ms VPU compute floor
(benchmarks/profile_em.py).

This kernel assigns each (batch, frequency) bin to one position of an
(8, 128) tile — 1024 bins per grid step, the eigh_small.py layout — and
keeps the normalized observations, responsibilities and model state
resident in VMEM while a fori_loop runs ALL EM iterations in-kernel:

  per iteration, per class k (statically unrolled, K and M compile-time):
    covar[k]  = m * sum_t (gamma*fm/kernel)[k,t] z_t z_t^H / den[k]
    alpha[k]  = masked mean_t gamma[k,t]              (update_alpha)
    b_inv[k], logdet[k] = Jacobi eigenvalue-floored inverse
                          (ops/pallas/eigh_small.jacobi_regularized_inverse)
    quad[k,t] = max(z_t^H b_inv[k] z_t, EPS)
    log_pdf   = -m log(quad) - logdet ; posterior softmax over k
    q[i]     += per-block partial of the masked log-marginal mean

The same kernel serves BOTH mixture models through a static ``model``
switch — the carried per-class plane is the CACG quadratic kernel
z^H B^{-1} z or the CG time-varying power phi = z^H R^{-1} z / M; the
M-step weight (gamma / carried) * (M / den) and the log-pdf
-M log(carried) - logdet are literally the same expression in both
(CGMM obs are the raw unnormalized spectra; CACGMM obs are
L2-normalized by the caller).

Math parity: /root/reference/scripts/sptk/libs/cluster.py:469-535 (the
Ito CACGMM trainer) and :184-287 (the Higuchi CGMM distribution),
identical update order to the XLA path; validated against it by
tests/test_pallas.py (interpret mode) and the on-chip golden runs.
Only the observations are read from HBM (once), only the final
responsibilities/state and the Q history are written back.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from setk_tpu.utils.common import EPSILON
from setk_tpu.ops.pallas.eigh_small import jacobi_regularized_inverse

__all__ = ["cacgmm_em_pallas", "cgmm_em_pallas", "cacgmm_fused_supported"]

_ROWS = 8
_LANES = 128
_TILE = _ROWS * _LANES
_SWEEPS = 6
# VMEM footprint guard for the resident arrays (the chip allows ~100MB
# scoped VMEM; leave headroom for Mosaic temporaries)
_VMEM_BUDGET = 64 * 1024 * 1024


def _em_kernel(m, k_classes, num_iters, update_alpha, sweeps, model,
               init, init_form, *refs):
    """One grid step = 1024 bins, all EM iterations.

    Ref shapes (leading block axis dropped by the BlockSpecs):
      zre/zim: (M, T, 8, 128)   g0/k0: (K, T, 8, 128)   fm: (T, 8, 128)
      gamma/kern: (K, T, 8, 128)   q: (num_iters, 8, 128)
      cre/cim: (K, M*M, 8, 128) alpha: (K, 8, 128)

    With ``init == "higuchi"`` the g0/k0 operands are ABSENT: the K=2
    covariance init (class 0 = fm-weighted sample covariance, class 1 =
    identity — /root/reference/scripts/sptk/libs/cluster.py:415-441)
    runs in-kernel as one extra half-iteration before the EM loop.  The
    XLA entry path for the same init (covar_stats kernel + Jacobi
    inverse kernel + pair-loop quad + posterior, each a separate
    dispatch with its own layout glue) measured ~6.7 ms/call at
    B=32 x 4 s (benchmarks/profile_em5.py r05) — the entire
    CGMM-vs-CACGMM throughput gap, paid 3x per WPD call.
    """
    if init == "higuchi":
        (zre_ref, zim_ref, fm_ref,
         gamma_ref, kern_ref, q_ref, cre_ref, cim_ref, alpha_ref) = refs
    else:
        (zre_ref, zim_ref, g0_ref, k0_ref, fm_ref,
         gamma_ref, kern_ref, q_ref, cre_ref, cim_ref, alpha_ref) = refs
    shape = (_ROWS, _LANES)
    fm = fm_ref[0]                              # (T, 8, 128)
    fm_den = jnp.maximum(jnp.sum(fm, axis=0), 1.0)  # (8, 128)

    # pair products P[i][j] = conj(z_i) z_j, recomputed per use from the
    # VMEM-resident observation block — caching all M(M+1)/2 (T, 8, 128)
    # pairs would double the footprint for two cheap VPU FMAs each
    def prod(i, j):
        zi_re, zi_im = zre_ref[0, i], zim_ref[0, i]
        zj_re, zj_im = zre_ref[0, j], zim_ref[0, j]
        p_re = zi_re * zj_re + zi_im * zj_im
        p_im = zi_re * zj_im - zi_im * zj_re
        return p_re, p_im

    def e_step(covar_re, covar_im, alpha, eye_class=None):
        """Inverse + quadratic + posterior from per-class covariances.

        ``eye_class`` marks a class whose covariance is EXACTLY the
        identity (the Higuchi noise init): its inverse is I (logdet of
        the max-scaled spectrum = 0) and its quadratic collapses to
        sum_i |z_i|^2 — no Jacobi, no off-diagonal terms.
        Returns (gamma, quad/phi plane, log_marginal)."""
        b_re = [None] * k_classes
        b_im = [None] * k_classes
        logdets = [None] * k_classes
        for k in range(k_classes):
            if k == eye_class:
                logdets[k] = jnp.zeros(shape, jnp.float32)
            else:
                b_re[k], b_im[k], logdets[k] = jacobi_regularized_inverse(
                    covar_re[k], covar_im[k], m, sweeps)
        qds = [jnp.zeros_like(fm) for _ in range(k_classes)]
        for i in range(m):
            p_re, _ = prod(i, i)
            for k in range(k_classes):
                d = p_re if k == eye_class else b_re[k][i][i] * p_re
                qds[k] = qds[k] + d
        for i in range(m):
            for j in range(i + 1, m):
                p_re, p_im = prod(i, j)
                for k in range(k_classes):
                    if k == eye_class:
                        continue
                    # 2 Re(conj(z_i) B_ij z_j) = 2 (Bre Pre - Bim Pim)
                    qds[k] = qds[k] + 2.0 * (b_re[k][i][j] * p_re -
                                             b_im[k][i][j] * p_im)
        log_pdf = [None] * k_classes
        quad = [None] * k_classes
        for k in range(k_classes):
            if model == "cg":
                # CGMM: the carried plane is phi = quad / M (time-varying
                # class power, /root/reference/scripts/sptk/libs/
                # cluster.py:184-235)
                quad[k] = jnp.maximum(qds[k], EPSILON) * (1.0 / m)
            else:
                quad[k] = jnp.maximum(qds[k], EPSILON)
            log_pdf[k] = -m * jnp.log(quad[k]) - logdets[k][None]
        # posterior with the max-shifted logsumexp Q statistic
        mx = log_pdf[0]
        for k in range(1, k_classes):
            mx = jnp.maximum(mx, log_pdf[k])
        num = [jnp.exp(log_pdf[k] - mx) * alpha[k][None]
               for k in range(k_classes)]
        den_p = num[0]
        for k in range(1, k_classes):
            den_p = den_p + num[k]
        den_p = jnp.maximum(den_p, EPSILON)
        # clamp: num/den can round to 1 + ulp in f32, which makes the
        # downstream (1 - mask) covariance weights negative on the
        # loudest frames (indefinite Rn -> Cholesky NaN)
        gamma = tuple(jnp.minimum(num[k] / den_p, 1.0)
                      for k in range(k_classes))
        log_marg = mx + jnp.log(den_p)                      # (T,8,128)
        return gamma, tuple(quad), log_marg

    def iteration(it, carry):
        gamma, kernel, alpha = carry   # K-tuples of (T,8,128) / (8,128)
        # M-step then E-step: per-class weights first, then ONE pair
        # pass with the class loop INSIDE — each (T, 8, 128) pair
        # product is computed once per pass instead of once per class
        # (at K=2 this removes ~30% of the kernel's T-proportional VPU
        # ops; caching the pairs ACROSS the covar and quad passes would
        # instead cost +42 MB of VMEM per block at T=251)
        covar_re, covar_im, alpha = m_step(gamma, kernel, alpha)
        gamma, quad, log_marg = e_step(covar_re, covar_im, alpha)
        q_ref[0, it] = jnp.sum(log_marg * fm, axis=0)
        # persist the M-step state (last iteration wins)
        for k in range(k_classes):
            for i in range(m):
                for j in range(m):
                    cre_ref[0, k, i * m + j] = covar_re[k][i][j]
                    cim_ref[0, k, i * m + j] = covar_im[k][i][j]
        return gamma, quad, alpha

    def m_step(gamma, kernel, alpha):
        """Weighted covariances (+ alpha update) from responsibilities —
        the M-step half of ``iteration``, shared by the covariance-carry
        loop below.  Returns (covar_re, covar_im, alpha)."""
        w = [None] * k_classes
        alpha_new = [None] * k_classes
        for k in range(k_classes):
            g = gamma[k] * fm
            den = jnp.maximum(jnp.sum(g, axis=0), EPSILON)
            w[k] = (g / jnp.maximum(kernel[k], EPSILON)) * (m / den)
            alpha_new[k] = (jnp.sum(g, axis=0) / fm_den
                            if update_alpha else alpha[k])
        covar_re = [[[None] * m for _ in range(m)]
                    for _ in range(k_classes)]
        covar_im = [[[None] * m for _ in range(m)]
                    for _ in range(k_classes)]
        for i in range(m):
            for j in range(i, m):
                p_re, p_im = prod(i, j)
                for k in range(k_classes):
                    covar_re[k][i][j] = jnp.sum(w[k] * p_re, axis=0)
                    covar_im[k][i][j] = -jnp.sum(w[k] * p_im, axis=0)
                    if j != i:
                        covar_re[k][j][i] = covar_re[k][i][j]
                        covar_im[k][j][i] = -covar_im[k][i][j]
        return covar_re, covar_im, tuple(alpha_new)

    def higuchi_covars(_):
        """K=2 covariance init: class 0 = fm-weighted sample covariance
        / max(sum fm, 1), class 1 = identity — exactly the XLA entry
        path's init (enhance/cluster.cgmm_em), computed in-kernel.
        Jacobi of an exact identity is exact: all off-diagonals are
        already annihilated, eigenvalues 1, logdet of the max-scaled
        spectrum 0."""
        cre0 = [[[jnp.zeros(shape, jnp.float32) for _ in range(m)]
                 for _ in range(m)] for _ in range(k_classes)]
        cim0 = [[[jnp.zeros(shape, jnp.float32) for _ in range(m)]
                 for _ in range(m)] for _ in range(k_classes)]
        for i in range(m):
            for j in range(i, m):
                p_re, p_im = prod(i, j)
                # R_ij = sum_t fm * z_i conj(z_j) / den = sum fm conj(P)
                cre0[0][i][j] = jnp.sum(fm * p_re, axis=0) / fm_den
                cim0[0][i][j] = -jnp.sum(fm * p_im, axis=0) / fm_den
                if j != i:
                    cre0[0][j][i] = cre0[0][i][j]
                    cim0[0][j][i] = -cim0[0][i][j]
            cre0[1][i][i] = jnp.ones(shape, jnp.float32)
        return cre0, cim0

    alpha0 = tuple(jnp.full(shape, 1.0 / k_classes, jnp.float32)
                   for _ in range(k_classes))
    if init == "higuchi" and init_form == "plane":
        # FAST form: the init predict (Higuchi covariances -> e_step)
        # runs once BEFORE the loop and the loop keeps the operand
        # path's (gamma, kernel) plane carry.  Costs ~+35 MB of scoped
        # VMEM (the init e_step's planes stay allocated across the
        # loop: 102.5M at M=6 T=251) so the driver selects it only
        # when the calibrated footprint model fits — see
        # _plane_init_fits.  Two slower alternatives measured
        # (profile_em5 r05, L2 cgmm 20 it): carrying the tiny
        # covariances instead of the planes (22.8 ms packed / 23.7
        # nested vs 19.2 here — per-iteration carry glue), and a
        # lax.cond covariance source inside the loop (24.8 ms — the
        # branch poisons Mosaic's loop pipelining).
        cre0, cim0 = higuchi_covars(None)
        gamma0, kernel0, _ = e_step(cre0, cim0, alpha0, eye_class=1)
        gamma, kernel, alpha = jax.lax.fori_loop(
            0, num_iters, iteration, (gamma0, kernel0, alpha0))
    elif init == "higuchi":
        # LONG-T form: carry the TINY (K*M*M, 8, 128) packed covariance
        # tiles instead of the (K, T) planes — E-step then M-step per
        # trip, one final E-step after the loop; same math and update
        # order (the e_step of the carried covar IS the predict that
        # closed the previous iteration).  Fits T >= 1001 where every
        # plane-carry form OOMs; ~3.3 ms/call slower at T=251.
        def pack(c):
            return jnp.stack([c[k][i][j] for k in range(k_classes)
                              for i in range(m) for j in range(m)])

        def unpack(p):
            return [[[p[(k * m + i) * m + j] for j in range(m)]
                     for i in range(m)] for k in range(k_classes)]

        def cov_iteration(it, carry):
            pre, pim, alpha = carry
            gamma, quad, log_marg = e_step(unpack(pre), unpack(pim),
                                           alpha)
            # the init predict's Q (trip 0) is not part of the history:
            # slot 0 is overwritten by trip 1 (the XLA path discards
            # the init predict's Q the same way)
            q_ref[0, jnp.maximum(it - 1, 0)] = jnp.sum(log_marg * fm,
                                                       axis=0)
            covar_re, covar_im, alpha = m_step(gamma, quad, alpha)
            return pack(covar_re), pack(covar_im), alpha

        cre0, cim0 = higuchi_covars(None)
        pre, pim, alpha = jax.lax.fori_loop(
            0, num_iters, cov_iteration, (pack(cre0), pack(cim0), alpha0))
        covar_re, covar_im = unpack(pre), unpack(pim)
        gamma, kernel, log_marg = e_step(covar_re, covar_im, alpha)
        q_ref[0, num_iters - 1] = jnp.sum(log_marg * fm, axis=0)
        for k in range(k_classes):
            for i in range(m):
                for j in range(m):
                    cre_ref[0, k, i * m + j] = covar_re[k][i][j]
                    cim_ref[0, k, i * m + j] = covar_im[k][i][j]
    else:
        gamma0 = tuple(g0_ref[0, k] for k in range(k_classes))
        kernel0 = tuple(k0_ref[0, k] for k in range(k_classes))
        gamma, kernel, alpha = jax.lax.fori_loop(
            0, num_iters, iteration, (gamma0, kernel0, alpha0))
    for k in range(k_classes):
        gamma_ref[0, k] = gamma[k]
        kern_ref[0, k] = kernel[k]
        alpha_ref[0, k] = alpha[k]


@partial(jax.jit, static_argnames=("m", "k_classes", "num_iters",
                                   "update_alpha", "sweeps", "model",
                                   "init", "init_form", "interpret"))
def _em_blocks(zre, zim, g0, k0, fm, m, k_classes, num_iters,
               update_alpha, sweeps, model, init, init_form, interpret):
    """Blocked entry: all arrays carry a leading (nb,) block axis.

    With ``init`` set, g0/k0 are None (jit treats them as empty
    pytrees) and the kernel takes no responsibility/plane operands.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    nb, _, t = zre.shape[:3]

    def spec(*dims):
        return pl.BlockSpec((1, *dims), lambda i: (i,) + (0,) * len(dims),
                            memory_space=pltpu.VMEM)

    kernel = partial(_em_kernel, m, k_classes, num_iters, update_alpha,
                     sweeps, model, init, init_form)
    g0k0_args = [] if init else [g0, k0]
    g0k0_specs = [] if init else [spec(k_classes, t, _ROWS, _LANES),
                                  spec(k_classes, t, _ROWS, _LANES)]
    return pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[spec(m, t, _ROWS, _LANES), spec(m, t, _ROWS, _LANES),
                  *g0k0_specs,
                  spec(t, _ROWS, _LANES)],
        out_specs=[spec(k_classes, t, _ROWS, _LANES),
                   spec(k_classes, t, _ROWS, _LANES),
                   spec(num_iters, _ROWS, _LANES),
                   spec(k_classes, m * m, _ROWS, _LANES),
                   spec(k_classes, m * m, _ROWS, _LANES),
                   spec(k_classes, _ROWS, _LANES)],
        out_shape=[
            jax.ShapeDtypeStruct((nb, k_classes, t, _ROWS, _LANES),
                                 jnp.float32),
            jax.ShapeDtypeStruct((nb, k_classes, t, _ROWS, _LANES),
                                 jnp.float32),
            jax.ShapeDtypeStruct((nb, num_iters, _ROWS, _LANES),
                                 jnp.float32),
            jax.ShapeDtypeStruct((nb, k_classes, m * m, _ROWS, _LANES),
                                 jnp.float32),
            jax.ShapeDtypeStruct((nb, k_classes, m * m, _ROWS, _LANES),
                                 jnp.float32),
            jax.ShapeDtypeStruct((nb, k_classes, _ROWS, _LANES),
                                 jnp.float32),
        ],
        # 116M: the in-kernel Higuchi init keeps its predict planes live
        # into the EM loop — 102.5M measured at B=32 x 4 s vs the old
        # 100M cap; the v5e core has 128M of VMEM
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=116 * 1024 * 1024),
        interpret=interpret,
    )(zre, zim, *g0k0_args, fm)


def _plane_init_fits(t: int, m: int, k_classes: int) -> bool:
    """Measurement-calibrated scoped-VMEM model for the FAST init form
    (init e_step before the loop, plane carry).

    Measured on the v5e (Mosaic scoped-vmem reports, K=2): M=6 T=251 ->
    102.5M, M=6 T=501 -> 167.35M (linear in T: ~38M + 0.259M/frame);
    M=5 T=368 compiled under the 116M limit, consistent with per-frame
    cost scaling ~2M (the z planes + per-class planes).  Model:
    38M + T * 2m * 22.6KB, gated at 112M for margin under the 116M
    compiler limit (128M physical minus Mosaic temporaries).
    """
    est = 38 * 1024 * 1024 + t * 2 * m * 22600 * max(k_classes / 2, 1.0)
    return est <= 112 * 1024 * 1024


def cacgmm_fused_supported(shape, num_classes: int,
                           num_iters: int, init: bool = False) -> bool:
    """Static dispatch guard: M cap, K cap and a measurement-calibrated
    scoped-VMEM gate per loop form (see _plane_init_fits for the
    calibration method; the original naive resident-array estimate
    under-counted Mosaic's stack ~4x and admitted shapes that OOM'd on
    chip — e.g. the CACGMM operand path at M=6 T=501).

    ``init=True``: the Higuchi-init dispatch, which can fall back to
    the packed covariance-carry form at long T (gate: the cov form
    compiled at M=6 T=501 on chip; 38M + T*2m*12K stays under the
    112M margin up to T~515 at M=6).  ``init=False``: the operand
    (g0/k0 plane) path — conservative 16K/frame/mic-plane gate fitted
    between M=5 T=368 (compiles) and M=6 T=501 (OOM).
    Shapes over the gate run the XLA scan instead of crashing.
    """
    *batch, f, m, t = shape
    if m > 8 or num_classes > 4 or num_iters > 64:
        return False
    kscale = max(num_classes / 2, 1.0)
    if init:
        fits = (_plane_init_fits(t, m, num_classes) or
                38 * 2**20 + t * 2 * m * 12288 * kscale <= 112 * 2**20)
    else:
        fits = 38 * 2**20 + t * 2 * m * 16384 * kscale <= 112 * 2**20
    return fits


def _to_bins(arr, lead_shape, t):
    """(..., T) with ... = (*lead, F[, M/K inner]) -> (nb, ..., T, 8, 128).

    Moves the flattened bin axis (all leading axes collapsed) to
    (nb, 8, 128) tiles; inner axes stay in place before T.
    """
    flat = arr.reshape(-1, *arr.shape[len(lead_shape):])
    nbins = flat.shape[0]
    pad = (-nbins) % _TILE
    if pad:
        flat = jnp.pad(flat, ((0, pad),) + ((0, 0),) * (flat.ndim - 1))
    nb = flat.shape[0] // _TILE
    # (nb, 8, 128, inner..., T) -> (nb, inner..., T, 8, 128)
    tiled = flat.reshape(nb, _ROWS, _LANES, *flat.shape[1:])
    perm = (0, *range(3, tiled.ndim), 1, 2)
    return jnp.transpose(tiled, perm)


def _em_pallas(obs, gamma0, kernel0, num_iters, model, update_alpha,
               frame_mask, return_state, sweeps, interpret,
               init=None, num_classes=None):
    """Shared fused-EM driver for both mixture models.

    obs (..., F, M, T), gamma0/kernel0 (K, ..., F, T); ``kernel0`` is the
    CACG quadratic kernel or the CG phi, per ``model``.  With
    ``init="higuchi"`` (K=2 only) gamma0/kernel0 are None and the
    covariance init runs in-kernel (pass ``num_classes`` explicitly).
    """
    *lead, f, m, t = obs.shape
    k_classes = num_classes if init else gamma0.shape[0]
    if init and k_classes != 2:
        raise ValueError("in-kernel Higuchi init is a K=2 construction")
    nbins = int(np.prod(lead)) * f if lead else f
    # frame mask doubles as the padded-bin mask (zero rows contribute
    # nothing to any statistic or to Q)
    if frame_mask is None:
        fm_full = jnp.ones((*lead, f, t), jnp.float32)
    else:
        fm_full = jnp.broadcast_to(jnp.asarray(frame_mask, jnp.float32),
                                   (*lead, f, t))
    lead_f = (*lead, f)
    zre = _to_bins(jnp.real(obs).astype(jnp.float32), lead_f, t)
    zim = _to_bins(jnp.imag(obs).astype(jnp.float32), lead_f, t)
    if init:
        g0b = k0b = None
    else:
        # gamma/kernel: (K, ..., F, T) -> bins-major with K inner
        g_in = jnp.moveaxis(gamma0.astype(jnp.float32), 0, -2)
        k_in = jnp.moveaxis(kernel0.astype(jnp.float32), 0, -2)
        g0b = _to_bins(g_in, lead_f, t)
        k0b = _to_bins(k_in, lead_f, t)
    fmb = _to_bins(fm_full, lead_f, t)

    init_form = ("plane" if _plane_init_fits(t, m, k_classes)
                 else "cov") if init else "plane"
    gamma_b, kern_b, q_b, cre_b, cim_b, alpha_b = _em_blocks(
        zre, zim, g0b, k0b, fmb, m=m, k_classes=k_classes,
        num_iters=num_iters, update_alpha=update_alpha, sweeps=sweeps,
        model=model, init=init, init_form=init_form,
        interpret=interpret)

    def from_bins(blocked, inner):
        # (nb, inner..., 8, 128) -> (nbins, inner...)
        moved = jnp.moveaxis(blocked, (-2, -1), (1, 2))
        flat = moved.reshape(-1, *blocked.shape[1:-2])[:nbins]
        return flat.reshape(*lead_f, *inner)

    gamma = jnp.moveaxis(from_bins(gamma_b, (k_classes, t)), -2, 0)
    # Q: masked mean of the log marginal over the real bins
    q_hist = (jnp.sum(q_b, axis=(0, 2, 3)) /
              jnp.maximum(jnp.sum(fm_full), 1.0))
    if not return_state:
        return gamma, q_hist
    covar = (from_bins(cre_b, (k_classes, m * m)) +
             1j * from_bins(cim_b, (k_classes, m * m)))
    covar = jnp.moveaxis(covar, -2, 0).reshape(k_classes, *lead_f, m, m)
    alpha = jnp.moveaxis(from_bins(alpha_b, (k_classes,)), -1, 0)
    state = {"covar": covar.astype(obs.dtype), "alpha": alpha}
    if model == "cg":
        state["phi"] = jnp.moveaxis(from_bins(kern_b, (k_classes, t)),
                                    -2, 0)
    return gamma, q_hist, state


def cacgmm_em_pallas(obs: jax.Array,
                     gamma0: jax.Array | None,
                     kernel0: jax.Array | None,
                     num_iters: int,
                     update_alpha: bool = True,
                     frame_mask: jax.Array | None = None,
                     return_state: bool = False,
                     sweeps: int = _SWEEPS,
                     init: str | None = None,
                     interpret: bool = False):
    """Fused CACGMM EM: obs (..., F, M, T) L2-normalized observations,
    gamma0/kernel0 (K, ..., F, T) initial responsibilities/kernels.

    Returns (gamma (K, ..., F, T), q_hist (num_iters,)) and the state
    dict when ``return_state``; drop-in for the scan in
    enhance/cluster.cacgmm_em.  ``init="higuchi"`` (K=2) replaces the
    gamma0/kernel0 operands (pass None) with the in-kernel covariance
    init — sample covariance vs identity.
    """
    return _em_pallas(obs, gamma0, kernel0, num_iters, "cacg",
                      update_alpha, frame_mask, return_state, sweeps,
                      interpret, init=init, num_classes=2)


def cgmm_em_pallas(obs: jax.Array,
                   gamma0: jax.Array | None,
                   phi0: jax.Array | None,
                   num_iters: int,
                   update_alpha: bool = False,
                   frame_mask: jax.Array | None = None,
                   return_state: bool = False,
                   sweeps: int = _SWEEPS,
                   init: str | None = None,
                   interpret: bool = False):
    """Fused CGMM EM: obs (..., F, M, T) RAW (unnormalized) spectra,
    gamma0/phi0 (K, ..., F, T) initial responsibilities / class powers.
    Drop-in for the scan in enhance/cluster.cgmm_em; the state dict
    gains the final "phi" plane.  ``init="higuchi"`` (the K=2 default
    init) runs the covariance init in-kernel — pass gamma0/phi0 None.
    """
    return _em_pallas(obs, gamma0, phi0, num_iters, "cg",
                      update_alpha, frame_mask, return_state, sweeps,
                      interpret, init=init, num_classes=2)
