"""CGMM/CACGMM parity tests against the reference EM (oracle import)."""

import numpy as np
import pytest

import reference_oracle as ro

from setk_tpu.enhance.cluster import (cgmm_em, cacgmm_em, permu_aligner,
                                      norm_observation)


def _spatial_mix(rng, m=4, f=16, t=80):
    """Two-source spatial mixture with distinct steering + noise."""
    a1 = rng.standard_normal((f, m, 1)) + 1j * rng.standard_normal((f, m, 1))
    a2 = rng.standard_normal((f, m, 1)) + 1j * rng.standard_normal((f, m, 1))
    s1 = np.zeros((f, 1, t), dtype=complex)
    s2 = np.zeros((f, 1, t), dtype=complex)
    # sources active in alternating time blocks (easy clustering)
    s1[:, :, :t // 2] = (rng.standard_normal((f, 1, t // 2)) +
                         1j * rng.standard_normal((f, 1, t // 2)))
    s2[:, :, t // 2:] = (rng.standard_normal((f, 1, t - t // 2)) +
                         1j * rng.standard_normal((f, 1, t - t // 2)))
    obs = a1 * s1 + a2 * s2 + 0.05 * (
        rng.standard_normal((f, m, t)) + 1j * rng.standard_normal((f, m, t)))
    return obs  # F x M x T


def test_cgmm_parity_k2(rng):
    obs = _spatial_mix(rng)
    obs_ref = np.einsum("fmt->mft", obs)
    trainer = ro.ref_cluster.CgmmTrainer(obs_ref, 2)
    ref_gamma = trainer.train(5)
    ours, q_hist = cgmm_em(obs.astype(np.complex64), 2, num_iters=5)
    ours = np.asarray(ours)
    assert ours.shape == ref_gamma.shape
    # posteriors agree closely (same init, deterministic K=2 path)
    np.testing.assert_allclose(ours, ref_gamma, atol=5e-2)
    # Q increased over EM
    assert q_hist[-1] > q_hist[0] - 1e-3


def test_cgmm_gamma_init_parity(rng):
    obs = _spatial_mix(rng, m=3, f=8, t=40)
    gamma0 = rng.random((8, 40))  # target-class gamma, F x T
    obs_ref = np.einsum("fmt->mft", obs)
    trainer = ro.ref_cluster.CgmmTrainer(obs_ref, 2, gamma=gamma0)
    ref_gamma = trainer.train(4)
    init = np.stack([gamma0, 1 - gamma0])
    ours, _ = cgmm_em(obs.astype(np.complex64), 2, num_iters=4,
                      gamma_init=init)
    np.testing.assert_allclose(np.asarray(ours), ref_gamma, atol=5e-2)


def test_cacgmm_parity_cgmm_init(rng):
    obs = _spatial_mix(rng)
    obs_ref = np.einsum("fmt->mft", obs)
    trainer = ro.ref_cluster.CacgmmTrainer(obs_ref, 2, cgmm_init=True,
                                           update_alpha=True)
    ref_gamma = trainer.train(5)
    ours, q_hist = cacgmm_em(obs.astype(np.complex64), 2, num_iters=5,
                             cgmm_init=True, update_alpha=True)
    # fp32 eigensolver vs the oracle's float64 LAPACK can bifurcate the EM
    # trajectory on isolated borderline TF bins; require near-total match
    mismatch = np.mean(np.abs(np.asarray(ours) - ref_gamma) > 5e-2)
    assert mismatch < 0.01, f"{mismatch:.4f} of posteriors diverged"


def test_cacgmm_gamma_init_parity(rng):
    obs = _spatial_mix(rng, m=3, f=8, t=40)
    gamma0 = rng.random((2, 8, 40))
    gamma0 = gamma0 / gamma0.sum(0, keepdims=True)
    obs_ref = np.einsum("fmt->mft", obs)
    trainer = ro.ref_cluster.CacgmmTrainer(obs_ref, 2, gamma=gamma0)
    ref_gamma = trainer.train(4)
    ours, _ = cacgmm_em(obs.astype(np.complex64), 2, num_iters=4,
                        gamma_init=gamma0)
    np.testing.assert_allclose(np.asarray(ours), ref_gamma, atol=5e-2)


def test_cgmm_separates_block_sources(rng):
    """End-to-end sanity: the estimated mask should track source activity."""
    obs = _spatial_mix(rng, m=4, f=16, t=80)
    gamma, _ = cgmm_em(obs.astype(np.complex64), 2, num_iters=15)
    gamma = np.asarray(gamma)
    # class 0 initialized from the full sample covariance: speech-ish.
    # check each class prefers one half of the signal consistently per freq
    first = gamma[..., :40].mean(-1)
    second = gamma[..., 40:].mean(-1)
    sep = np.abs(first - second).mean()
    assert sep > 0.3


def test_frame_masked_em_ignores_padding(rng):
    """Padded frames with frame_mask=0 must not change the EM result."""
    obs = _spatial_mix(rng, m=3, f=8, t=40).astype(np.complex64)
    gamma, _ = cgmm_em(obs, 2, num_iters=8)
    # pad 24 junk frames, mask them out
    junk = (rng.standard_normal((8, 3, 24)) * 10).astype(np.complex64)
    padded = np.concatenate([obs, junk], axis=-1)
    fmask = np.zeros((8, 64), dtype=np.float32)
    fmask[:, :40] = 1.0
    gamma_p, _ = cgmm_em(padded, 2, num_iters=8, frame_mask=fmask)
    np.testing.assert_allclose(np.asarray(gamma_p)[..., :40],
                               np.asarray(gamma), atol=2e-2)
    # cacgmm too
    g1, _ = cacgmm_em(obs, 2, num_iters=8, cgmm_init=True)
    g2, _ = cacgmm_em(padded, 2, num_iters=8, cgmm_init=True,
                      frame_mask=fmask)
    mism = np.mean(np.abs(np.asarray(g2)[..., :40] - np.asarray(g1)) > 5e-2)
    assert mism < 0.02, mism


def test_permu_aligner_fixes_swaps(rng):
    f, t, k = 257, 50, 2
    base = rng.random((k, t, f))
    base[0, :25] += 2.0
    base[1, 25:] += 2.0
    masks = base / base.sum(0, keepdims=True)
    # randomly swap classes on half the bins
    swapped = masks.copy()
    flip = rng.random(f) > 0.5
    swapped[:, :, flip] = swapped[::-1, :, flip]
    aligned = permu_aligner(swapped)
    # aligned masks should match the un-swapped masks (up to global permu)
    direct = np.abs(aligned - masks).mean()
    flipped = np.abs(aligned[::-1] - masks).mean()
    assert min(direct, flipped) < 0.02


def test_permu_aligner_matches_reference(rng):
    f, t, k = 257, 30, 3
    masks = rng.random((k, t, f))
    masks = masks / masks.sum(0, keepdims=True)
    ref = ro.ref_cluster.permu_aligner(masks.copy())
    ours = permu_aligner(masks.copy())
    np.testing.assert_allclose(ours, ref, atol=1e-6)
