"""Beamformer + linalg parity tests against the reference implementation
(imported directly from /root/reference as an oracle) plus property tests."""

import numpy as np
import pytest

import reference_oracle as ro

from setk_tpu.enhance import beamformer as bf
from setk_tpu.enhance.masks import compute_mask
from setk_tpu.ops.linalg import (generalized_eigh, solve_pevd, hermitianize,
                                 regularized_inverse, power_iteration)
from setk_tpu.spatial.steer import (linear_steer_vector,
                                    circular_steer_vector, diffuse_covar,
                                    circular_distance_matrix,
                                    linear_distance_matrix)


def _synth_obs(rng, n=4, f=33, t=60):
    """Synthetic mixture: low-rank 'speech' + noise, complex128 oracle-side."""
    src = rng.standard_normal((f, 1, t)) + 1j * rng.standard_normal((f, 1, t))
    a = rng.standard_normal((f, n, 1)) + 1j * rng.standard_normal((f, n, 1))
    noise = (rng.standard_normal((f, n, t)) +
             1j * rng.standard_normal((f, n, t))) * 0.3
    obs = a * src + noise  # F x N x T
    mask = rng.random((f, t)) * 0.8 + 0.1
    return obs, mask


def test_compute_covar_parity(rng):
    obs, mask = _synth_obs(rng)
    ours = np.asarray(bf.compute_covar(obs.astype(np.complex64),
                                       mask.astype(np.float32)))
    # reference wants obs N x F x T, mask T x F
    ref = ro.ref_beamformer.compute_covar(obs.transpose(1, 0, 2), mask.T)
    np.testing.assert_allclose(ours, ref, atol=1e-3, rtol=1e-3)
    # property: Hermitian PSD
    np.testing.assert_allclose(ours,
                               np.conj(np.swapaxes(ours, -1, -2)),
                               atol=1e-4)
    eigvals = np.linalg.eigvalsh(ours)
    assert eigvals.min() > -1e-3


def _angle_align(a, b):
    """Fix per-vector phase so two eigenvector sets are comparable."""
    phase = np.exp(-1j * np.angle(np.sum(np.conj(a) * b, axis=-1)))
    return a, b * phase[..., None]


def test_solve_pevd_parity(rng):
    obs, mask = _synth_obs(rng)
    rs = ro.ref_beamformer.compute_covar(obs.transpose(1, 0, 2), mask.T)
    ref = ro.ref_beamformer.solve_pevd(rs)
    ours = np.asarray(solve_pevd(rs.astype(np.complex64)))
    ours, ref = _angle_align(ours, ref)
    np.testing.assert_allclose(ours, ref, atol=2e-3)


def test_generalized_eigh_parity(rng):
    obs, mask = _synth_obs(rng)
    rs = ro.ref_beamformer.compute_covar(obs.transpose(1, 0, 2), mask.T)
    rn = ro.ref_beamformer.compute_covar(obs.transpose(1, 0, 2), 1 - mask.T)
    ref = ro.ref_beamformer.solve_pevd(rs, rn)
    ours = np.asarray(solve_pevd(rs.astype(np.complex64),
                                 rn.astype(np.complex64)))
    ours_a, ref_a = _angle_align(ours, ref)
    # scipy normalizes v^H Rn v = 1; ours does too (up to fp32 + loading)
    np.testing.assert_allclose(ours_a, ref_a, atol=5e-2, rtol=5e-2)
    # stronger invariant: generalized Rayleigh quotients match
    def rq(v):
        num = np.einsum("...a,...ab,...b->...", np.conj(v), rs, v)
        den = np.einsum("...a,...ab,...b->...", np.conj(v), rn, v)
        return np.real(num / den)
    np.testing.assert_allclose(rq(ours), rq(ref), rtol=1e-3)


@pytest.mark.parametrize("kind", ["mvdr", "gevd", "pmwf-0", "pmwf-1"])
def test_weights_against_reference_classes(rng, kind):
    obs, mask = _synth_obs(rng)
    f, n = obs.shape[0], obs.shape[1]
    obs_ref = obs.transpose(1, 0, 2)  # N x F x T
    ref_cls = {
        "mvdr": ro.ref_beamformer.MvdrBeamformer(f),
        "gevd": ro.ref_beamformer.GevdBeamformer(f),
        "pmwf-0": ro.ref_beamformer.PmwfBeamformer(f, beta=0),
        "pmwf-1": ro.ref_beamformer.PmwfBeamformer(f, beta=1),
    }[kind]
    ref_out = ref_cls.run(mask.T, obs_ref)  # F x T
    ours = np.asarray(
        bf.supervised_run(kind, obs.astype(np.complex64),
                          mask.astype(np.float32)))
    if kind in ("gevd", "mvdr"):
        # eigenvector-derived weights carry an arbitrary per-bin phase in
        # the reference (LAPACK convention; we anchor to mic 0 instead):
        # compare magnitudes plus phase-aligned waveforms per bin
        np.testing.assert_allclose(np.abs(ours), np.abs(ref_out),
                                   atol=5e-2, rtol=5e-2)
        inner = np.sum(np.conj(ref_out) * ours, axis=-1)
        phase = inner / np.maximum(np.abs(inner), 1e-10)
        np.testing.assert_allclose(ours, ref_out * phase[:, None],
                                   atol=5e-2, rtol=5e-2)
    else:
        np.testing.assert_allclose(ours, ref_out, atol=2e-2, rtol=2e-2)


def test_ban_parity(rng):
    obs, mask = _synth_obs(rng)
    rn = ro.ref_beamformer.compute_covar(obs.transpose(1, 0, 2), 1 - mask.T)
    weight = rng.standard_normal(
        (obs.shape[0], obs.shape[1])) + 1j * rng.standard_normal(
            (obs.shape[0], obs.shape[1]))
    ref = ro.ref_beamformer.do_ban(weight, rn)
    ours = np.asarray(
        bf.do_ban(weight.astype(np.complex64), rn.astype(np.complex64)))
    np.testing.assert_allclose(ours, ref, atol=1e-3, rtol=1e-3)


def test_steer_vectors_parity():
    topo = [0.0, 0.05, 0.1, 0.15]
    ref = ro.ref_beamformer.linear_steer_vector(np.array(topo), 77, 257)
    ours = linear_steer_vector(topo, 77.0, 257)
    np.testing.assert_allclose(ours, ref, atol=1e-5)
    ref = ro.ref_beamformer.circular_steer_vector(0.05, 6, 133, 257, c=340)
    ours = circular_steer_vector(0.05, 6, 133.0, 257, c=340)
    np.testing.assert_allclose(ours, ref, atol=1e-5)
    # center-mic variant
    ref = ro.ref_beamformer.circular_steer_vector(0.05, 6, 10, 129, c=340,
                                                  center=True)
    ours = circular_steer_vector(0.05, 6, 10.0, 129, c=340, center=True)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_diffuse_covar_parity():
    topo = np.array([0.0, 0.04, 0.08, 0.12])
    dist = linear_distance_matrix(topo)
    ref = ro.ref_beamformer.diffuse_covar(129, dist, diag_eps=0.1)
    ours = diffuse_covar(129, dist, diag_eps=0.1)
    np.testing.assert_allclose(ours.real, ref, atol=1e-5)
    # circular chord distances
    ref_cls = ro.ref_beamformer.CircularSDBeamformer(0.05, 6)
    ours_d = circular_distance_matrix(0.05, 6)
    np.testing.assert_allclose(ours_d, ref_cls.distance_mat, atol=1e-8)


def test_ds_sd_beamformer_parity(rng):
    topo = [0.0, 0.05, 0.1, 0.15]
    f, t = 129, 40
    obs = (rng.standard_normal((4, f, t)) +
           1j * rng.standard_normal((4, f, t)))
    doa = 63.0
    ref_ds = ro.ref_beamformer.LinearDSBeamformer(topo)
    ref_out = ref_ds.run(doa, obs)
    sv = linear_steer_vector(topo, doa, f)
    ours = np.asarray(
        bf.beamform(bf.ds_weights(sv), obs.transpose(1, 0, 2)))
    np.testing.assert_allclose(ours, ref_out, atol=1e-4)
    ref_sd = ro.ref_beamformer.LinearSDBeamformer(topo)
    ref_out = ref_sd.run(doa, obs)
    rn = diffuse_covar(f, linear_distance_matrix(topo), diag_eps=0.1)
    ours = np.asarray(
        bf.beamform(bf.sd_weights(bf.ds_weights(sv), rn),
                    obs.transpose(1, 0, 2)))
    np.testing.assert_allclose(ours, ref_out, atol=1e-3, rtol=1e-3)


def test_mvdr_power_steer_equivalent(rng):
    """Power-iteration steering matches eigh steering (fast path)."""
    obs, mask = _synth_obs(rng)
    obs = obs.astype(np.complex64)
    mask = mask.astype(np.float32)
    rs = np.asarray(bf.compute_covar(obs, mask))
    rn = np.asarray(bf.compute_covar(obs, 1 - mask))
    w_eigh = np.asarray(bf.mvdr_weights(rs, rn, steer="eigh"))
    w_pow = np.asarray(bf.mvdr_weights(rs, rn, steer="power",
                                       power_iters=30))
    out_e = np.asarray(bf.beamform(w_eigh, obs))
    out_p = np.asarray(bf.beamform(w_pow, obs))
    # same beamformed output up to fp noise (rank-1-dominated Rs)
    rel = np.linalg.norm(out_e - out_p) / np.linalg.norm(out_e)
    assert rel < 1e-2


def test_online_matches_offline_last_chunk_shape(rng):
    obs, mask = _synth_obs(rng, n=3, f=17, t=64)
    out = np.asarray(
        bf.online_supervised_run("mvdr", obs.astype(np.complex64),
                                 mask.astype(np.float32), chunk_size=16))
    assert out.shape == (17, 64)
    assert np.isfinite(out).all()


def test_mask_types_parity(rng):
    """Mask formulas vs an independent numpy transcription of the doc."""
    f, t = 20, 30
    tgt = rng.standard_normal((t, f)) + 1j * rng.standard_normal((t, f))
    mix = tgt + 0.5 * (rng.standard_normal(
        (t, f)) + 1j * rng.standard_normal((t, f)))
    irm = np.asarray(compute_mask(tgt, mix, "irm"))
    iam = np.asarray(compute_mask(tgt, mix, "iam"))
    psm = np.asarray(compute_mask(tgt, mix, "psm"))
    ibm = np.asarray(compute_mask(tgt, mix, "ibm"))
    noise = mix - tgt
    np.testing.assert_allclose(
        irm, np.abs(tgt) / np.sqrt(np.abs(tgt)**2 + np.abs(noise)**2 + 1.2e-7),
        atol=1e-5)
    np.testing.assert_allclose(iam, np.abs(tgt) / np.abs(mix), atol=1e-4)
    np.testing.assert_allclose(
        psm, (np.abs(tgt) / np.abs(mix)) *
        np.cos(np.angle(mix) - np.angle(tgt)), atol=1e-4)
    assert set(np.unique(ibm)) <= {0.0, 1.0}
    wiener = np.asarray(compute_mask(tgt, mix, "wiener"))
    np.testing.assert_allclose(wiener, irm**2, atol=1e-5)
    assert (wiener >= 0).all() and (wiener <= 1).all()


def test_regularized_inverse_and_power_iteration(rng):
    obs, mask = _synth_obs(rng, n=5, f=9)
    r = np.asarray(
        bf.compute_covar(obs.astype(np.complex64), mask.astype(np.float32)))
    inv, logdet = regularized_inverse(r, return_logdet=True)
    inv = np.asarray(inv)
    # R @ inv(R_scaled) = max_eig * I approximately (scaled inverse)
    w = np.linalg.eigvalsh(r)
    recon = np.einsum("...ab,...bc->...ac", r, inv) / w.max(-1)[..., None,
                                                               None]
    eye = np.broadcast_to(np.eye(5), recon.shape)
    np.testing.assert_allclose(recon, eye, atol=1e-2)
    # power iteration converges to the principal eigenvector
    pv = np.asarray(power_iteration(r.astype(np.complex64), num_iters=50))
    ev = np.asarray(solve_pevd(r))
    cos = np.abs(np.sum(np.conj(pv) * ev, -1))
    assert cos.min() > 0.999


def test_unrolled_cholesky_solve_matches_xla(rng):
    """The documented (non-dispatched) unrolled solve stays correct."""
    import jax.numpy as jnp
    from setk_tpu.ops.linalg import (_unrolled_cholesky_solve, _diag_load,
                                     hermitianize, hermitian_solve)
    a = (rng.standard_normal((40, 6, 6)) +
         1j * rng.standard_normal((40, 6, 6)))
    a = (a @ np.conj(np.swapaxes(a, -1, -2))).astype(np.complex64)
    b = (rng.standard_normal((40, 6, 2)) +
         1j * rng.standard_normal((40, 6, 2))).astype(np.complex64)
    loaded = np.asarray(_diag_load(hermitianize(jnp.asarray(a)), 1e-6))
    got = np.asarray(_unrolled_cholesky_solve(jnp.asarray(loaded),
                                              jnp.asarray(b)))
    # residual check (solution comparison is meaningless for the odd
    # ill-conditioned random system in float32)
    res = np.abs(loaded @ got - b).max(axis=(-2, -1))
    scale = np.abs(b).max(axis=(-2, -1))
    assert (res < 1e-2 * scale).all()


def test_equilibrated_solve_degenerate(rng):
    """equilibrated_hermitian_solve: exact on well-conditioned systems,
    finite on the pathologies that NaN'd the plain loaded Cholesky
    (rank-deficient covariance with large row-scale spread; tiny
    negative eigenvalue from over-1 mask weights; all-zero rows)."""
    import jax.numpy as jnp
    from setk_tpu.ops.linalg import (equilibrated_hermitian_solve,
                                     hermitian_solve)
    n = 6
    a = rng.standard_normal((8, n, n)) + 1j * rng.standard_normal((8, n, n))
    spd = a @ np.conj(np.swapaxes(a, -1, -2)) + 0.1 * np.eye(n)
    b = rng.standard_normal((8, n)) + 1j * rng.standard_normal((8, n))
    x_ref = np.asarray(hermitian_solve(jnp.asarray(spd), jnp.asarray(b)))
    x_eq = np.asarray(equilibrated_hermitian_solve(jnp.asarray(spd),
                                                   jnp.asarray(b)))
    np.testing.assert_allclose(x_eq, x_ref, rtol=5e-4, atol=1e-5)
    # rank-1 PSD with a 1e6 row-scale spread (rank-deficient + badly
    # scaled — the saturated-mask covariance class; the plain loaded
    # f32 Cholesky back-substitution blows up through the inconsistent
    # triangle on this class).  The contract covers inputs PSD up to
    # f32 rounding — the source-side posterior/weight clamps guarantee
    # that for every covariance we build.
    v = (rng.standard_normal(n) + 1j * rng.standard_normal(n))
    scale = np.diag([1e3, 1.0, 1e-3, 1.0, 1e3, 1.0])
    bad = (scale @ np.outer(v, np.conj(v)) @ scale).astype(np.complex64)
    x = np.asarray(equilibrated_hermitian_solve(
        jnp.asarray(bad[None]),
        jnp.asarray(b[:1].astype(np.complex64))))
    assert np.isfinite(x).all()
    # all-zero matrix: solution ~ bounded (not Inf)
    z = np.zeros((1, n, n), np.complex64)
    xz = np.asarray(equilibrated_hermitian_solve(jnp.asarray(z),
                                                 jnp.asarray(b[:1])))
    assert np.isfinite(xz).all()
