"""WPE dereverberation and factored WPD — batched, jitted.

Math parity: /root/reference/scripts/sptk/libs/wpe.py (Yoshioka GWPE:
delayed tap stacking, context-smoothed power lambda, per-bin NK x NK
normal-equation solve; Nakatani factored WPD interleaving a WPE step, a
CGMM mask and a lambda-weighted MVDR).  All bins F (and any leading batch
axes) solve in one batched ``jnp.linalg.solve``; iterations are a
``lax.scan``.
"""

import jax
import jax.numpy as jnp

from setk_tpu.utils.common import EPSILON, GRAM_PRECISION
from setk_tpu.enhance import beamformer as bf
from setk_tpu.enhance.cluster import cgmm_em
from setk_tpu.ops.linalg import (solve_pevd, hermitian_solve,
                                 equilibrated_hermitian_solve)

__all__ = ["compute_tap_mat", "compute_lambda", "wpe_step", "wpe", "wpd"]


def compute_tap_mat(obs: jax.Array, taps: int, delay: int) -> jax.Array:
    """Stack delayed taps: (..., F, N, T) -> (..., F, N*taps, T).

    Tap block k holds the observation delayed by (k + delay) frames,
    zero-padded at the front — parity with
    /root/reference/scripts/sptk/libs/wpe.py:14-29.
    """
    *lead, f, n, t = obs.shape
    blocks = []
    for k in range(taps):
        d = k + delay
        if d < t:
            pad = [(0, 0)] * (obs.ndim - 1) + [(d, 0)]
            blocks.append(jnp.pad(obs[..., :t - d], pad))
        else:
            blocks.append(jnp.zeros_like(obs))
    return jnp.concatenate(blocks, axis=-2)


def compute_lambda(dereverb: jax.Array, context: int = 0) -> jax.Array:
    """Context-smoothed mean power: (..., F, N, T) -> (..., F, T).

    Mean over mics of |d|^2, then a (2*context+1) sliding average over
    frames with edge-correct counts
    (/root/reference/scripts/sptk/libs/wpe.py:32-55).
    """
    power = jnp.mean(jnp.real(dereverb)**2 + jnp.imag(dereverb)**2, axis=-2)
    t = power.shape[-1]
    acc = jnp.zeros_like(power)
    counts = jnp.zeros((t,), dtype=power.dtype)
    for c in range(-context, context + 1):
        s, e = max(c, 0), min(t, t + c)
        src_s, src_e = max(-c, 0), min(t, t - c)
        pad = [(0, 0)] * (power.ndim - 1) + [(s, t - e)]
        acc = acc + jnp.pad(power[..., src_s:src_e], pad)
        counts = counts.at[s:e].add(1.0)
    return jnp.maximum(acc / counts, EPSILON)


def wpe_step(reverb: jax.Array, taps_mat: jax.Array,
             lambda_: jax.Array, equilibrate: bool = False) -> jax.Array:
    """One WPE filter update + application.

    reverb (..., F, N, T), taps_mat (..., F, NK, T), lambda (..., F, T);
    returns the dereverberated (..., F, N, T).
    Parity: /root/reference/scripts/sptk/libs/wpe.py:58-77 — the
    reference weights one operand by 1/lambda; weighting BOTH by
    sqrt(1/lambda) is the same bilinear form but lets one Gram matmul
    over [reverb; taps] produce corr (delayed x delayed block) AND cross
    (delayed x current block) from a single weighted-operand pass (the
    separate yn/corr/cross einsums cost an extra ~4 GB of HBM traffic
    per iteration at the B=32 bench shape).
    """
    n = reverb.shape[-2]
    s = jax.lax.rsqrt(jnp.maximum(lambda_, EPSILON))[..., None, :]
    y2 = jnp.concatenate([reverb * s, taps_mat * s], axis=-2)
    gram = jnp.einsum("...mt,...nt->...mn", y2, jnp.conj(y2),
                      precision=GRAM_PRECISION)
    corr = gram[..., n:, n:]
    cross = gram[..., n:, :n]
    # keep the hermitianize pass: when WPE nearly annihilates a
    # deterministic signal, lambda collapses ~6 orders and the weighted
    # tap Gram's PSD margin approaches f32 rounding — skipping the
    # 0.5 (A + A^H) average NaN'd a pure-chirp torture input at
    # iteration 3 (raising eps_rel to 1e-5 also fixes it, but perturbs
    # the near-singular tonal solves enough to decorrelate the batched
    # vs single CLI paths).
    # ``equilibrate`` (the WPD path): symmetric Jacobi scaling before the
    # solve — WPD's 1/|enhanced|^2 weights push the Gram's f32 condition
    # past Cholesky even with loading (ops/linalg.
    # equilibrated_hermitian_solve).  Plain WPE keeps the bare solve for
    # strict batched-vs-single parity.
    solve = equilibrated_hermitian_solve if equilibrate else hermitian_solve
    filt = solve(corr, cross)
    return reverb - jnp.einsum("...na,...nb->...ab", jnp.conj(filt),
                               taps_mat, precision=GRAM_PRECISION)


def _wpe_fused(reverb, taps, delay, context, num_iters, interpret=False):
    """Tap-free fused WPE: the Gram/apply kernels build the delayed-tap
    design matrix in VMEM from the raw spectra (the XLA path's
    (.., N*K, T) tap stack costs ~35 ms to build and every Gram/apply
    pass re-streams ~2.2 GB of it — ops/pallas/wpe_gram.py)."""
    from setk_tpu.ops.pallas.cholesky import solve_wpe_gram_pallas
    from setk_tpu.ops.pallas.wpe_gram import (wpe_apply_pallas,
                                              wpe_gram_pallas)
    *lead, f, n, t = reverb.shape
    nk = n * taps
    obs_re = jnp.real(reverb).reshape(-1, n, t).astype(jnp.float32)
    obs_im = jnp.imag(reverb).reshape(-1, n, t).astype(jnp.float32)
    bins = obs_re.shape[0]
    g_re = jnp.zeros((bins, nk, n), jnp.float32)
    g_im = jnp.zeros((bins, nk, n), jnp.float32)
    for i in range(num_iters):
        gr, gi = wpe_gram_pallas(obs_re, obs_im, g_re, g_im, n=n,
                                 taps=taps, delay=delay, context=context,
                                 use_g=i > 0, interpret=interpret)
        # planar gram-layout solve: corr/cross slicing, loading and the
        # normal-equation solve all stay in-kernel (the complex gram
        # assembly + minor-dim slices + layout round trip here cost
        # ~2 ms/iteration of XLA glue).  The gram kernel's THREE-term
        # bf16 split keeps entries f32-grade, so the plain 1e-6
        # hermitian loading of the XLA path applies unchanged — the
        # 2-term split needed a 8e-6*NK floor that NaN-proofed a chirp
        # mixture but cost ~20 dB of golden speech parity (filter
        # shift is O(eps * cond); doc/KERNELS.md round-3).
        g_re, g_im = solve_wpe_gram_pallas(gr, gi, row0=n, n=nk, k=n,
                                           interpret=interpret)
    dr, di = wpe_apply_pallas(obs_re, obs_im, g_re, g_im, n=n, taps=taps,
                              delay=delay, interpret=interpret)
    d = (dr + 1j * di)[:, :n].astype(reverb.dtype)
    return d.reshape(*lead, f, n, t)


def wpe(reverb: jax.Array,
        taps: int = 10,
        delay: int = 3,
        context: int = 1,
        num_iters: int = 3,
        use_fused: bool | None = None) -> jax.Array:
    """GWPE over (..., F, N, T): iterate lambda -> filter.

    Parity: /root/reference/scripts/sptk/libs/wpe.py:80-110.
    """
    if use_fused is None:
        from setk_tpu.utils.hostdev import tpu_target
        from setk_tpu.ops.pallas.wpe_gram import wpe_fused_supported
        use_fused = tpu_target() and wpe_fused_supported(
            reverb.shape[-2], taps)
    if use_fused:
        return _wpe_fused(reverb, taps, delay, context, num_iters)
    taps_mat = compute_tap_mat(reverb, taps, delay)

    def step(dereverb, _):
        # floor: zero-padded frames in bucketed batches give lambda = 0,
        # and 0/0 taps would poison the tap correlations with NaN
        lam = jnp.maximum(compute_lambda(dereverb, context=context),
                          EPSILON)
        return wpe_step(reverb, taps_mat, lam), None

    dereverb, _ = jax.lax.scan(step, reverb, None, length=num_iters)
    return dereverb


def _wpd_wpe_step_fused(obs_re, obs_im, lam_flat, n, taps, delay,
                        interpret=False):
    """WPD's WPE step with EXTERNAL lambda through the tap-free fused
    kernels: gram (weights = the supplied lambda, no in-kernel dereverb
    power) -> lane-batched Cholesky solve -> apply."""
    from setk_tpu.ops.pallas.cholesky import solve_wpe_gram_pallas
    from setk_tpu.ops.pallas.wpe_gram import (wpe_apply_pallas,
                                              wpe_gram_pallas)
    bins, _, t = obs_re.shape
    nk = n * taps
    g0 = jnp.zeros((bins, nk, n), jnp.float32)
    gr, gi = wpe_gram_pallas(obs_re, obs_im, g0, g0, n=n, taps=taps,
                             delay=delay, context=0, use_g=False,
                             lam=lam_flat, interpret=interpret)
    # in-kernel Jacobi equilibration (exact math — the WPD 1/lambda
    # Grams exceed plain f32 Cholesky conditioning); with the gram
    # kernel's 3-term bf16 split the entries are f32-grade, so the
    # loading floor is the same 4*NK*f32_eps the equilibrated XLA path
    # clamps to (the 2-term split needed NK*8e-6, ~16x more)
    g_re, g_im = solve_wpe_gram_pallas(gr, gi, row0=n, n=nk, k=n,
                                       eps_rel=4.0 * nk * EPSILON,
                                       equilibrate=True,
                                       interpret=interpret)
    dr, di = wpe_apply_pallas(obs_re, obs_im, g_re, g_im,
                              n=n, taps=taps, delay=delay,
                              interpret=interpret)
    return (dr + 1j * di)[:, :n]


def wpd(obs: jax.Array,
        cgmm_iters: int = 10,
        wpd_iters: int = 3,
        taps: int = 10,
        delay: int = 3,
        context: int = 1,
        update_alpha: bool = False,
        use_fused: bool | None = None,
        interpret: bool = False):
    """Factored WPD: joint dereverberation + denoising.

    obs (F, N, T) complex (leading batch axes allowed).  Each outer
    iteration: WPE step with the current lambda, CGMM mask estimation on
    the dereverberated signal, then a lambda-weighted MVDR; lambda
    becomes the enhanced power.  Returns (tf_mask (F, T), enhanced
    (F, T)).  On the TPU target the WPE step runs through the tap-free
    fused kernels with the WPD lambda as an operand, the inner CGMM
    through the fused in-VMEM EM kernel, and the weighted covariances
    through the Pallas covariance kernel.
    Parity: /root/reference/scripts/sptk/libs/wpe.py:113-177.
    """
    *lead, f, n, t = obs.shape
    if use_fused is None:
        from setk_tpu.utils.hostdev import tpu_target
        from setk_tpu.ops.pallas.wpe_gram import wpe_fused_supported
        use_fused = tpu_target() and wpe_fused_supported(n, taps)
    if use_fused:
        obs_re = jnp.real(obs).reshape(-1, n, t).astype(jnp.float32)
        obs_im = jnp.imag(obs).reshape(-1, n, t).astype(jnp.float32)
    else:
        taps_mat = compute_tap_mat(obs, taps, delay)
    enhanced = None
    tf_mask = None
    for i in range(wpd_iters):  # static outer loop (small)
        if i == 0:
            lam = jnp.maximum(compute_lambda(obs, context=context),
                              EPSILON)
        else:
            lam = jnp.maximum(jnp.abs(enhanced)**2, EPSILON)
        if use_fused:
            der = _wpd_wpe_step_fused(
                obs_re, obs_im, lam.reshape(-1, t).astype(jnp.float32),
                n, taps, delay, interpret=interpret).reshape(obs.shape)
        else:
            der = wpe_step(obs, taps_mat, lam, equilibrate=True)
        # fused path: 3 Jacobi sweeps in the inner EM's regularized
        # inverse — the masks only SEED the weighted MVDR here, and the
        # golden WPD cosine holds (sweeps attribution: doc/KERNELS.md)
        gamma, _ = cgmm_em(der, 2, num_iters=cgmm_iters,
                           update_alpha=update_alpha,
                           sweeps=3 if use_fused else None)
        tf_mask = gamma[0]  # speech class (sample-covariance init)
        if use_fused:
            # ONE fused pair-covariance pass for (Rs, Rd): the pair
            # products are shared and obs is read once
            # (ops/pallas/covariance_pair.py).  Rd here is normalized by
            # sum(1/lambda) instead of the XLA twin's 1/t — the Capon
            # weight is scale-invariant in Rd (relative diagonal
            # loading, ops/pallas/mvdr.py), so only f32 rounding
            # differs.  Two separate kernel calls measured ~5.3 ms/iter
            # of the WPD budget vs ~3.5 for the fused pair + solve
            # (profile_wpd r05).
            rs, rd = bf.compute_covar_pair(der, tf_mask, 1.0 / lam)
            # the lambda-weighted MVDR = Capon against Rd with an
            # Rs-principal steer — exactly the fused power-iteration
            # kernel (steer + anchored Cholesky Capon in one VMEM pass).
            # The XLA twin below (eigh steer + equilibrated solve) cost
            # ~8 ms/outer-iteration at B=32 x 4 s, ~all of it the
            # batched 6x6 eigh (benchmarks/profile_wpd.py r04 budget).
            from setk_tpu.ops.pallas.mvdr import mvdr_power_pallas
            weight = mvdr_power_pallas(rs, rd, interpret=interpret)
            enhanced = bf.beamform(weight, der)
        else:
            rd = jnp.einsum("...nt,...mt->...nm", der / lam[..., None, :],
                            jnp.conj(der), precision=GRAM_PRECISION) / t
            rs = bf.compute_covar(der, tf_mask)
            steer = bf.fix_steer_phase(solve_pevd(rs))
            num = equilibrated_hermitian_solve(rd, steer)
            den = jnp.einsum("...d,...d->...", jnp.conj(steer), num)
            weight = num / den[..., None]
            enhanced = jnp.einsum("...n,...nt->...t", jnp.conj(weight),
                                  der)
    return tf_mask, enhanced
