"""Beamforming core: mask-weighted PSDs and all weight solvers — batched JAX.

Functional re-design of the reference's class family
(/root/reference/scripts/sptk/libs/beamformer.py): every function is pure,
batched over arbitrary leading axes, and jit/vmap/shard_map friendly.
Canonical layouts (F: bins, N: mics, T: frames):

    obs     (..., F, N, T)   complex STFT observations
    mask    (..., F, T)      real T-F masks
    covar   (..., F, N, N)   Hermitian PSDs
    weight  (..., F, N)      beamformer weights

Covariance accumulation is an einsum over T (the MXU-heavy op); the
per-bin eigen/linear solves are batched over F via ops.linalg.  Online
(chunked) processing is a lax.scan with EMA covariance carries, matching
the reference's OnlineSupervisedBeamformer semantics
(/root/reference/scripts/sptk/libs/beamformer.py:286-320).
"""

from functools import partial

import jax
import jax.numpy as jnp

from setk_tpu.utils.common import EPSILON
from setk_tpu.ops.linalg import (solve_pevd, hermitianize, hermitian_solve,
                                 equilibrated_hermitian_solve)

__all__ = [
    "compute_covar", "compute_covar_pair", "covar_stats",
    "do_ban", "beamform", "beam_pattern", "rank1_constraint",
    "ds_weights", "sd_weights", "mvdr_weights", "mpdr_weights", "gevd_weights",
    "pmwf_weights", "pmwf_select_ref", "pmwf_select_powers",
    "supervised_run",
    "online_supervised_run", "WEIGHT_FNS"
]


def covar_stats(obs: jax.Array, mask: jax.Array, use_pallas=None):
    """Unnormalized covariance sufficient statistics (num, den).

    num[..., n, m] = sum_t m[..., t] y_n y*_m ; den = sum_t m.  The
    building block for both one-shot covariances and the psum-reduced
    sequence-parallel path.

    Backend ladder (measured on chip, B=32 F=272 N=6 T=512):
      * einsum -> batched matmul with an N x N output: ~0.2% MXU
        utilization (the naive lowering; kept only for N > 8);
      * statically-unrolled pair loop on the VPU: ~20x faster;
      * the Pallas kernel (ops/pallas/covariance.py), which keeps the
        observation tile in VMEM for all N^2 reductions — one HBM read
        total, another ~10x (29 ms -> 3 ms).
    ``use_pallas=None`` auto-enables the kernel on the TPU backend.
    """
    n = obs.shape[-2]
    den = jnp.sum(mask, axis=-1)
    if n > 8:
        num = jnp.einsum("...nt,...mt->...nm", mask[..., None, :] * obs,
                         jnp.conj(obs))
        return num, den
    if use_pallas is None:
        use_pallas = _use_pallas_default()
    if use_pallas:
        from setk_tpu.ops.pallas.covariance import masked_covar_pallas
        f, t = obs.shape[-3], obs.shape[-1]
        # callers may broadcast (e.g. one obs against K mask classes)
        lead = jnp.broadcast_shapes(obs.shape[:-3], mask.shape[:-2])
        flat = jnp.broadcast_to(obs, (*lead, f, n, t)).reshape(
            (-1, f, n, t))
        mflat = jnp.broadcast_to(mask, (*lead, f, t)).reshape((-1, f, t))
        f_tile = 16
        pad = (-f) % f_tile
        if pad:
            flat = jnp.pad(flat, ((0, 0), (0, pad), (0, 0), (0, 0)))
            mflat = jnp.pad(mflat, ((0, 0), (0, pad), (0, 0)))
        nre, nim, _ = masked_covar_pallas(jnp.real(flat), jnp.imag(flat),
                                          mflat, f_tile=f_tile)
        num = (nre + 1j * nim)[:, :f].reshape((*lead, f, n, n))
        return num.astype(obs.dtype), den
    mobs = mask[..., None, :] * obs
    rows = []
    for a in range(n):
        cols = []
        for b in range(n):
            if b < a:
                cols.append(jnp.conj(rows[b][a]))
            else:
                cols.append(
                    jnp.sum(mobs[..., a, :] * jnp.conj(obs[..., b, :]),
                            axis=-1))
        rows.append(cols)
    num = jnp.stack([jnp.stack(c, axis=-1) for c in rows], axis=-2)
    return num, den


def _use_pallas_default() -> bool:
    """Dispatch on the *active* target: under on_host() the default
    device is the CPU even when the process backend is a TPU, and the
    Pallas kernels only lower for TPU."""
    from setk_tpu.utils.hostdev import tpu_target
    return tpu_target()


def compute_covar(obs: jax.Array,
                  mask: jax.Array,
                  denom_floor: float = 1e-6) -> jax.Array:
    """Mask-weighted spatial covariance (PSD).

    R[f] = sum_t m[f,t] y[f,t] y[f,t]^H / sum_t m[f,t]
    Parity: /root/reference/scripts/sptk/libs/beamformer.py:87-103.
    """
    num, den = covar_stats(obs, mask)
    return num / jnp.maximum(den, denom_floor)[..., None, None]


def compute_covar_pair(obs: jax.Array,
                       mask_s: jax.Array,
                       mask_n: jax.Array | None = None,
                       denom_floor: float = 1e-6,
                       use_pallas: bool | None = None):
    """(Rs, Rn) from one observation read — the supervised-run hot path.

    Equivalent to two ``compute_covar`` calls with mask_s and
    (1 - mask_s | mask_n), but on the TPU backend dispatches to the
    fused pair kernel (ops/pallas/covariance_pair.py): the x_a conj(y_b)
    products are shared between both covariances, the reduction runs
    over the sublane (T) axis, and the (B, N, T, F) internal layout
    cancels the caller's STFT transpose.  Each mask multiplies the pair
    products elementwise before reduction, so Rn keeps the PSD-ness of
    the literal sum (no total-minus-masked cancellation).
    """
    if use_pallas is None:
        use_pallas = _use_pallas_default()
    if use_pallas and obs.shape[-2] <= 8:
        from setk_tpu.ops.pallas.covariance_pair import \
            compute_covar_pair_pallas
        return compute_covar_pair_pallas(obs, mask_s, mask_n,
                                         denom_floor=denom_floor)
    rs = compute_covar(obs, mask_s, denom_floor)
    rn = compute_covar(obs,
                       jnp.maximum(1 - mask_s, 0) if mask_n is None
                       else mask_n,
                       denom_floor)
    return rs, rn


def beamform(weight: jax.Array, obs: jax.Array) -> jax.Array:
    """Apply w^H y per bin: (..., F, N) x (..., F, N, T) -> (..., F, T).

    Written as an explicit broadcast-multiply + N-reduction (VPU) rather
    than an einsum that would lower to a K=N matmul (~10x slower).
    """
    return jnp.sum(jnp.conj(weight)[..., None] * obs, axis=-2)


def do_ban(weight: jax.Array, rn: jax.Array) -> jax.Array:
    """Blind Analytic Normalization post-filter.

    Parity: /root/reference/scripts/sptk/libs/beamformer.py:14-28.
    """
    num = jnp.einsum("...a,...ab,...bc,...c->...", jnp.conj(weight), rn, rn,
                     weight)
    den = jnp.einsum("...a,...ab,...b->...", jnp.conj(weight), rn, weight)
    filters = jnp.sqrt(jnp.abs(num)) / jnp.maximum(jnp.real(den), EPSILON)
    return filters[..., None] * weight


def beam_pattern(weight: jax.Array, steer_vector: jax.Array) -> jax.Array:
    """|w^H d| over a steering grid.

    weight (..., F, N); steer_vector (A, F, N) or (F, D, N)-style grids —
    contraction is over the shared mic axis with broadcasting elsewhere.
    Returns the reference's F x D response for 2D weights with an
    F x D x N grid (/root/reference/scripts/sptk/libs/beamformer.py:106-130).
    """
    resp = jnp.einsum("fdn,...fn->...fd", steer_vector, jnp.conj(weight))
    return jnp.abs(resp)


def rank1_constraint(rs: jax.Array, rn: jax.Array | None = None) -> jax.Array:
    """Rank-1 approximation of Rs (optionally GEV-based), trace-rescaled.

    Parity: /root/reference/scripts/sptk/libs/beamformer.py:66-84.
    """
    pvec = solve_pevd(rs, rn)
    if rn is not None:
        pvec = jnp.einsum("...ab,...b->...a", rn, pvec)
    appro = jnp.einsum("...a,...b->...ab", pvec, jnp.conj(pvec))
    scale = (jnp.trace(rs, axis1=-2, axis2=-1) /
             jnp.maximum(jnp.abs(jnp.trace(appro, axis1=-2, axis2=-1)),
                         EPSILON))
    return scale[..., None, None] * appro


def fix_steer_phase(steer: jax.Array, ref_channel: int = 0) -> jax.Array:
    """Rotate each steer vector so its reference-channel entry is
    real-positive.

    Eigenvector-derived steer vectors carry an arbitrary per-bin phase
    (solver-dependent); under the distortionless constraint that phase
    rotates the beamformer output per bin.  Anchoring the phase to a
    physical reference channel makes the output deterministic — the
    enhanced signal is the source as observed at that mic.
    """
    ref = steer[..., ref_channel]
    phase = ref / jnp.maximum(jnp.abs(ref), EPSILON)
    return steer * jnp.conj(phase)[..., None]


def _capon(steer: jax.Array, r: jax.Array) -> jax.Array:
    """w = R^{-1} d / (d^H R^{-1} d) — the distortionless solution.

    Equilibrated solve + guarded denominator: saturated masks produce
    rank-deficient per-bin covariances whose plain loaded Cholesky
    NaN'd (see ops/pallas/mvdr._equilibrated_cholesky); the denominator
    floor keeps degenerate bins at a bounded (garbage but finite)
    weight, where the reference's unloaded numpy solve raises
    LinAlgError and skips the whole utterance."""
    num = equilibrated_hermitian_solve(r, steer)
    den = jnp.sum(jnp.conj(steer) * num, axis=-1)
    den = jnp.where(jnp.abs(den) < EPSILON, EPSILON, den)
    return num / den[..., None]


def ds_weights(steer: jax.Array, num_mics: int | None = None) -> jax.Array:
    """Delay-and-sum: normalized steer vector."""
    n = num_mics if num_mics is not None else steer.shape[-1]
    return steer / n


def sd_weights(steer: jax.Array, diffuse_rn: jax.Array) -> jax.Array:
    """Superdirective (MVDR against a diffuse-field model)."""
    return _capon(steer, diffuse_rn)


def mvdr_weights(rs: jax.Array, rn: jax.Array,
                 steer: str = "eigh",
                 power_iters: int = 15,
                 use_pallas: bool | None = None) -> jax.Array:
    """MVDR with steer vector from the principal eigenvector of Rs.

    Parity: /root/reference/scripts/sptk/libs/beamformer.py:515-539 (plus
    deterministic mic-0 phase anchoring of the steer vector; the reference
    inherits LAPACK's arbitrary per-bin eigenvector phase).

    ``steer="power"`` swaps the full eigendecomposition for fixed-count
    power iteration — speech PSDs are rank-1 dominated, and the batched
    matvecs run on the VPU at a fraction of eigh's cost (the production
    fast path; "eigh" is the reference-exact default).  On the TPU backend
    the power path further dispatches to the fused Pallas solve
    (ops/pallas/mvdr.py: steer + Cholesky Capon in one VMEM pass), which
    replaces the XLA batched small-matrix cholesky/triangular_solve — the
    single most expensive stage of the bench step.
    """
    if steer == "power":
        if use_pallas is None:
            use_pallas = _use_pallas_default()
        if use_pallas and rs.shape[-1] <= 8:
            from setk_tpu.ops.pallas.mvdr import mvdr_power_pallas
            return mvdr_power_pallas(rs, rn, power_iters=power_iters)
        from setk_tpu.ops.linalg import power_iteration
        vec = power_iteration(hermitianize(rs), num_iters=power_iters)
    else:
        vec = solve_pevd(rs)
    return _capon(fix_steer_phase(vec), rn)


def mpdr_weights(rs: jax.Array,
                 ry: jax.Array,
                 rn: jax.Array | None = None) -> jax.Array:
    """MPDR: minimum power distortionless response w.r.t. Ry.

    With ``rn`` the steer vector comes from the whitened GEV
    (Rn * gev-principal-vector), else from Rs's principal eigenvector.
    Parity: /root/reference/scripts/sptk/libs/beamformer.py:542-590.
    """
    if rn is None:
        steer = solve_pevd(rs)
    else:
        gev = solve_pevd(rs, rn)
        steer = jnp.einsum("...ab,...b->...a", rn, gev)
    return _capon(fix_steer_phase(steer), ry)


def gevd_weights(rs: jax.Array, rn: jax.Array) -> jax.Array:
    """Max-SNR / GEV beamformer: principal generalized eigenvector,
    phase-anchored to channel 0.

    The reference returns the raw eigenvector
    (/root/reference/scripts/sptk/libs/beamformer.py:662-682) whose
    per-bin phase is solver-arbitrary — two equally-valid runs produce
    different waveforms through the overlap-add.  Anchoring the phase
    to a reference channel (the standard GEV phase correction, as in
    pb_bss) makes the output deterministic and matches the fused TPU
    kernel's convention; magnitude-domain parity with the reference is
    unaffected.
    """
    return fix_steer_phase(solve_pevd(rs, rn))


def pmwf_weights(rs: jax.Array,
                 rn: jax.Array,
                 beta: float = 0.0,
                 ref_channel: int = -1,
                 rank1_appro: str = "") -> jax.Array:
    """Parameterized multichannel Wiener filter (Souden).

    w = Rn^{-1} Rs u / (beta + tr(Rn^{-1} Rs)); beta=0 -> MVDR form,
    beta=1 -> MCWF.  ``ref_channel < 0`` selects the reference channel by
    the estimated output SNR (argmax over channels, computed batched).
    Parity: /root/reference/scripts/sptk/libs/beamformer.py:593-659.
    """
    if rank1_appro == "eig":
        rs = rank1_constraint(rs)
    elif rank1_appro == "gev":
        rs = rank1_constraint(rs, rn=rn)
    num = hermitian_solve(rn, rs)  # (..., F, N, N)
    den = beta + jnp.trace(num, axis1=-2, axis2=-1)
    weight_mat = num / den[..., None, None]
    return pmwf_select_ref(weight_mat, rs, rn, ref_channel=ref_channel)


def pmwf_select_ref(weight_mat: jax.Array, rs: jax.Array, rn: jax.Array,
                    ref_channel: int = -1) -> jax.Array:
    """Pick the PMWF output column: fixed ``ref_channel`` or the
    SNR-argmax over channels (reference: libs/beamformer.py:620-630)."""
    if ref_channel >= 0:
        return weight_mat[..., ref_channel]
    # snr_c = sum_f w_c^H Rs w_c / sum_f w_c^H Rn w_c
    wc = jnp.swapaxes(weight_mat, -1, -2)  # (..., F, C, N) rows = channels
    pow_s = jnp.real(
        jnp.einsum("...fca,...fab,...fcb->...c", jnp.conj(wc), rs, wc))
    pow_n = jnp.real(
        jnp.einsum("...fca,...fab,...fcb->...c", jnp.conj(wc), rn, wc))
    snr = pow_s / jnp.maximum(pow_n, EPSILON)
    ref = jnp.argmax(snr, axis=-1)
    return jnp.take_along_axis(weight_mat,
                               ref[..., None, None, None],
                               axis=-1)[..., 0]


def pmwf_select_powers(weight_mat: jax.Array, pow_s: jax.Array,
                       pow_n: jax.Array) -> jax.Array:
    """SNR-argmax reference-channel selection from PRECOMPUTED
    per-channel powers (..., F, C) — the in-kernel outputs of
    ``pmwf_solve_pallas(return_powers=True)``.  Same semantics as
    ``pmwf_select_ref`` with ref_channel=-1, without its two tiny-N
    einsums (which lower to MXU-hostile batched matmuls)."""
    snr = (jnp.sum(pow_s, axis=-2) /
           jnp.maximum(jnp.sum(pow_n, axis=-2), EPSILON))
    ref = jnp.argmax(snr, axis=-1)
    return jnp.take_along_axis(weight_mat,
                               ref[..., None, None, None],
                               axis=-1)[..., 0]


WEIGHT_FNS = {
    "mvdr": mvdr_weights,
    "gevd": gevd_weights,
    "pmwf-0": partial(pmwf_weights, beta=0.0),
    "pmwf-1": partial(pmwf_weights, beta=1.0),
}


def supervised_run(beamformer: str,
                   obs: jax.Array,
                   mask_s: jax.Array,
                   mask_n: jax.Array | None = None,
                   ban: bool = False,
                   **kwargs) -> jax.Array:
    """One-shot mask-based beamforming: masks + obs -> enhanced STFT.

    Mirrors SupervisedBeamformer.run / MpdrBeamformer.run
    (/root/reference/scripts/sptk/libs/beamformer.py:270-283,573-590);
    masks and obs use the canonical (..., F, T) / (..., F, N, T) layouts.
    """
    # compute_covar_pair shares the pair products between Rs and Rn but
    # keeps each mask's multiply *elementwise before reduction* — an
    # earlier fusion computing Rn = total - masked at the accumulator
    # level went indefinite for oracle masks ~1 (Cholesky NaN) and was
    # reverted; the literal sum_t (1-m) y y^H stays PSD.
    rs, rn = compute_covar_pair(obs, mask_s, mask_n)
    if beamformer in ("mpdr", "mpdr-whiten"):
        ry = compute_covar(obs, jnp.ones_like(mask_s))
        weight = mpdr_weights(rs, ry,
                              rn=rn if beamformer == "mpdr-whiten" else None)
    elif beamformer in WEIGHT_FNS:
        weight = WEIGHT_FNS[beamformer](rs, rn, **kwargs)
    else:
        raise ValueError(f"Unknown beamformer: {beamformer}")
    if ban:
        weight = do_ban(weight, rn)
    return beamform(weight, obs)


def online_supervised_run(beamformer: str,
                          obs: jax.Array,
                          mask_s: jax.Array,
                          mask_n: jax.Array | None = None,
                          chunk_size: int = 32,
                          alpha: float = 0.8,
                          ban: bool = False) -> jax.Array:
    """Chunked online beamforming with EMA covariance state.

    Splits T into chunks, carries (Rs, Rn) through a lax.scan with
    R <- alpha R + (1 - alpha) R_chunk (first chunk initializes), and
    beamforms each chunk with the current weights — semantics of
    do_online_beamform + OnlineSupervisedBeamformer
    (/root/reference/scripts/sptk/apply_adaptive_beamformer.py:25-47,
    libs/beamformer.py:286-320).  T must be a multiple of chunk_size
    (pad upstream; masks can zero-out pad frames).
    """
    if beamformer not in WEIGHT_FNS:
        raise ValueError(f"Unknown online beamformer: {beamformer}")
    weight_fn = WEIGHT_FNS[beamformer]
    *lead, f_bins, n_mics, t_frames = obs.shape
    if t_frames % chunk_size:
        raise ValueError(f"T={t_frames} not a multiple of {chunk_size}")
    n_chunks = t_frames // chunk_size
    m_n = jnp.maximum(1 - mask_s, 0) if mask_n is None else mask_n

    # scan over the chunk axis (moved to front)
    def to_chunks(x):
        x = x.reshape(*x.shape[:-1], n_chunks, chunk_size)
        return jnp.moveaxis(x, -2, 0)

    obs_c = to_chunks(obs)          # (C, ..., F, N, Tc)
    ms_c = to_chunks(mask_s)        # (C, ..., F, Tc)
    mn_c = to_chunks(m_n)

    covar_shape = (*lead, f_bins, n_mics, n_mics)
    init = (jnp.zeros(covar_shape, obs.dtype),
            jnp.zeros(covar_shape, obs.dtype), jnp.asarray(True))

    def step(carry, xs):
        rs_ema, rn_ema, first = carry
        obs_k, ms_k, mn_k = xs
        rs = compute_covar(obs_k, ms_k)
        rn = compute_covar(obs_k, mn_k)
        phi = jnp.where(first, 1.0, 1.0 - alpha).astype(jnp.float32)
        rs_ema = rs_ema * alpha + phi * rs
        rn_ema = rn_ema * alpha + phi * rn
        weight = weight_fn(rs_ema, rn_ema)
        if ban:
            weight = do_ban(weight, rn)
        chunk = beamform(weight, obs_k)
        return (rs_ema, rn_ema, jnp.asarray(False)), chunk

    _, chunks = jax.lax.scan(step, init, (obs_c, ms_c, mn_c))
    # (C, ..., F, Tc) -> (..., F, T)
    return jnp.moveaxis(chunks, 0, -2).reshape(*lead, f_bins, t_frames)
