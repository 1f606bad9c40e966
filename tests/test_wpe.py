"""WPE/WPD parity tests against the reference implementation."""

import numpy as np

import reference_oracle as ro

from setk_tpu.enhance.wpe import (compute_tap_mat, compute_lambda, wpe_step,
                                  wpe, wpd)


def _reverb_obs(rng, f=16, n=3, t=60):
    return (rng.standard_normal((f, n, t)) +
            1j * rng.standard_normal((f, n, t)))


def test_tap_mat_parity(rng):
    obs = _reverb_obs(rng)
    ref = ro.ref_wpe.compute_tap_mat(obs, 5, 2)
    ours = np.asarray(compute_tap_mat(obs.astype(np.complex64), 5, 2))
    np.testing.assert_allclose(ours, ref, atol=1e-5)
    # degenerate: delay beyond T
    ref = ro.ref_wpe.compute_tap_mat(obs[..., :4], 3, 5)
    ours = np.asarray(compute_tap_mat(obs[..., :4].astype(np.complex64), 3, 5))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_lambda_parity(rng):
    obs = _reverb_obs(rng)
    for ctx in (0, 1, 3):
        ref = ro.ref_wpe.compute_lambda(obs, ctx=ctx)
        ours = np.asarray(compute_lambda(obs.astype(np.complex64),
                                         context=ctx))
        np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-4)


def test_wpe_step_parity(rng):
    obs = _reverb_obs(rng)
    yt = ro.ref_wpe.compute_tap_mat(obs, 4, 2)
    lam = ro.ref_wpe.compute_lambda(obs, ctx=1)
    ref = ro.ref_wpe.wpe_step(obs, yt, lam)
    ours = np.asarray(
        wpe_step(obs.astype(np.complex64),
                 np.asarray(yt).astype(np.complex64),
                 lam.astype(np.float32)))
    np.testing.assert_allclose(ours, ref, atol=2e-2, rtol=2e-2)


def test_wpe_full_parity(rng):
    obs = _reverb_obs(rng, f=8, n=2, t=50)
    ref = ro.ref_wpe.wpe(obs, taps=4, delay=2, context=1, num_iters=3)
    ours = np.asarray(
        wpe(obs.astype(np.complex64), taps=4, delay=2, context=1,
            num_iters=3))
    np.testing.assert_allclose(ours, ref, atol=5e-2, rtol=5e-2)


def test_wpe_decorrelates_late_taps(rng):
    """WPE's objective: output decorrelated from the delayed observation."""
    f, n, t = 8, 2, 200
    dry = (rng.standard_normal((f, 1, t)) +
           1j * rng.standard_normal((f, 1, t)))
    a = rng.standard_normal((f, n, 1)) + 1j * rng.standard_normal((f, n, 1))
    x = a * dry
    reverb = x.copy()
    for d in range(3, 10):
        reverb[..., d:] += 0.8 * (0.8**(d - 3)) * x[..., :t - d]
    out = np.asarray(wpe(reverb.astype(np.complex64), taps=8, delay=3))

    def late_corr(sig):
        # correlation of the signal with the delayed observation
        num = 0.0
        for d in range(3, 10):
            c = np.abs(np.sum(sig[..., d:] * np.conj(reverb[..., :t - d])))
            num += c / (np.linalg.norm(sig[..., d:]) *
                        np.linalg.norm(reverb[..., :t - d]))
        return num
    assert late_corr(out) < 0.6 * late_corr(reverb)


def test_wpd_runs_and_enhances(rng):
    obs = _reverb_obs(rng, f=8, n=3, t=60).astype(np.complex64)
    mask, enh = wpd(obs, cgmm_iters=3, wpd_iters=2, taps=4, delay=2)
    assert np.asarray(mask).shape == (8, 60)
    assert np.asarray(enh).shape == (8, 60)
    assert np.isfinite(np.asarray(enh)).all()
    m = np.asarray(mask)
    assert (m >= 0).all() and (m <= 1 + 1e-5).all()


def test_wpd_fused_matches_xla(rng):
    """The tap-free fused WPD WPE-step (external lambda operand,
    interpret mode) + Pallas covariance/Capon path reproduces the XLA
    WPD.  The inner CGMM auto-dispatches to XLA on CPU, so the
    comparison isolates the WPE/covariance/weight kernels.

    Since round 4 the fused path's weighted MVDR uses the
    power-iteration Capon kernel (the same documented policy as the
    whole TPU beamformer family) instead of the XLA twin's exact-eigh
    steer + equilibrated solve — mathematically the same beamformer,
    but steer directions can differ at f32 on near-degenerate bins, so
    the comparison is cosine/correlation, not elementwise."""
    obs = _reverb_obs(rng, f=8, n=3, t=64).astype(np.complex64)
    ref_m, ref_e = wpd(obs, cgmm_iters=3, wpd_iters=2, taps=4, delay=2,
                       use_fused=False)
    got_m, got_e = wpd(obs, cgmm_iters=3, wpd_iters=2, taps=4, delay=2,
                       use_fused=True, interpret=True)
    ge, re_ = np.asarray(got_e).ravel(), np.asarray(ref_e).ravel()
    cos = np.abs(np.vdot(ge, re_)) / (
        np.linalg.norm(ge) * np.linalg.norm(re_))
    assert cos > 0.99, cos
    gm, rm = np.asarray(got_m).ravel(), np.asarray(ref_m).ravel()
    assert np.corrcoef(gm, rm)[0, 1] > 0.99
    assert np.abs(gm - rm).mean() < 0.02


def test_wpd_batched_matches_single(rng):
    """Leading batch axis: batched WPD == per-utterance WPD."""
    import jax.numpy as jnp
    obs = np.stack([_reverb_obs(rng, f=8, n=3, t=48).astype(np.complex64)
                    for _ in range(2)])
    bm, be = wpd(jnp.asarray(obs), cgmm_iters=2, wpd_iters=2, taps=3,
                 delay=2, use_fused=False)
    for b in range(2):
        sm, se = wpd(jnp.asarray(obs[b]), cgmm_iters=2, wpd_iters=2,
                     taps=3, delay=2, use_fused=False)
        scale = np.abs(np.asarray(se)).max()
        np.testing.assert_allclose(np.asarray(be)[b], np.asarray(se),
                                   atol=1e-4 * scale)
