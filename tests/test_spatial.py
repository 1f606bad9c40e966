"""SSL + spatial feature parity tests against the reference oracle."""

import numpy as np
import pytest

import reference_oracle as ro

from setk_tpu.spatial import features as sf
from setk_tpu.spatial import ssl
from setk_tpu.spatial.steer import linear_steer_vector


def _steered_mix(rng, doa_deg=59.0, m=4, t=40, f=129, topo=None, snr=0.05):
    """Mixture steered from one direction over a linear array (M, T, F)."""
    if topo is None:
        topo = [0.0, 0.05, 0.1, 0.15]
    sv = linear_steer_vector(topo, doa_deg, f)  # F x M
    src = rng.standard_normal((t, f)) + 1j * rng.standard_normal((t, f))
    obs = sv.T[:, None, :] * src[None] + snr * (
        rng.standard_normal((m, t, f)) + 1j * rng.standard_normal((m, t, f)))
    return obs, topo


def _grid(topo, f, num_doa=181):
    doas = np.linspace(0, 180, num_doa)
    sv = linear_steer_vector(topo, doas, f)  # A x F x M
    return np.transpose(sv, (0, 2, 1))  # A x M x F


@pytest.mark.parametrize("backend", ["ml", "srp", "music"])
def test_ssl_finds_doa(rng, backend):
    obs, topo = _steered_mix(rng, doa_deg=59.0)
    grid = _grid(topo, obs.shape[-1])
    if backend == "ml":
        idx = int(ssl.ml_ssl(obs, grid))
        ref = int(ro.ref_ssl.ml_ssl(obs, grid))
    elif backend == "srp":
        pair = ([0, 0, 0, 1, 1, 2], [1, 2, 3, 2, 3, 3])
        idx = int(ssl.srp_ssl(obs, grid, pair))
        ref = int(ro.ref_ssl.srp_ssl(obs, grid, srp_pair=pair))
    else:
        idx = int(ssl.music_ssl(obs, grid))
        ref = int(ro.ref_ssl.music_ssl(obs, grid))
    assert abs(idx - 59) <= 2  # 1-degree grid
    assert abs(idx - ref) <= 1


def test_ml_ssl_scores_parity(rng):
    obs, topo = _steered_mix(rng, doa_deg=100.0)
    grid = _grid(topo, obs.shape[-1], num_doa=61)
    mask = rng.random(obs.shape[1:])
    _, scores = ssl.ml_ssl(obs, grid, mask=mask, return_scores=True)
    ref_idx = ro.ref_ssl.ml_ssl(obs, grid, mask=mask)
    np.testing.assert_equal(int(np.argmax(np.asarray(scores))), int(ref_idx))


def test_ipd_parity(rng):
    t, f = 30, 65
    si = rng.standard_normal((t, f)) + 1j * rng.standard_normal((t, f))
    sj = rng.standard_normal((t, f)) + 1j * rng.standard_normal((t, f))
    for cos, sin in ((False, False), (True, False), (True, True)):
        ref = ro.ref_spatial.ipd(si, sj, cos=cos, sin=sin)
        ours = np.asarray(sf.ipd(si, sj, cos=cos, sin=sin))
        np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_gcc_phat_linear_parity(rng):
    t, f = 20, 65
    si = rng.standard_normal((t, f)) + 1j * rng.standard_normal((t, f))
    sj = rng.standard_normal((t, f)) + 1j * rng.standard_normal((t, f))
    ref = ro.ref_spatial.gcc_phat_linear(si, sj, 0.1, num_bins=f, num_doa=37)
    ours = np.asarray(
        sf.gcc_phat_linear(si, sj, 0.1, num_bins=f, num_doa=37))
    np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-4)


def test_srp_phat_linear_parity(rng):
    n, t, f = 4, 20, 65
    spec = rng.standard_normal((n, t, f)) + 1j * rng.standard_normal(
        (n, t, f))
    topo = [0.0, 0.05, 0.1, 0.15]
    ref = ro.ref_spatial.srp_phat_linear(spec, topo, num_bins=f, num_doa=37)
    ours = np.asarray(sf.srp_phat_linear(spec, topo, num_bins=f, num_doa=37))
    np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-4)


def test_gcc_phat_diag_parity(rng):
    t, f = 20, 65
    si = rng.standard_normal((t, f)) + 1j * rng.standard_normal((t, f))
    sj = rng.standard_normal((t, f)) + 1j * rng.standard_normal((t, f))
    ref = ro.ref_spatial.gcc_phat_diag(si, sj, 0.7, 0.1, num_bins=f,
                                       num_doas=25)
    ours = np.asarray(
        sf.gcc_phat_diag(si, sj, 0.7, 0.1, num_bins=f, num_doas=25))
    np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-4)


def test_msc_parity(rng):
    n, t, f = 3, 15, 33
    spec = rng.standard_normal((n, t, f)) + 1j * rng.standard_normal(
        (n, t, f))
    ref = ro.ref_spatial.msc(spec, context=1)
    ours = np.asarray(sf.msc(spec, context=1))
    np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-4)


def test_directional_feats_parity(rng):
    m, f, t = 4, 33, 20
    spec = rng.standard_normal((m, f, t)) + 1j * rng.standard_normal(
        (m, f, t))
    steer = rng.standard_normal((m, f)) + 1j * rng.standard_normal((m, f))
    ref = ro.ref_spatial.directional_feats(spec, steer)
    ours = np.asarray(sf.directional_feats(spec, steer))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_smooth_angular_spectrogram():
    """Edge-clamped context mean matches the C++ Smooth loop
    (/root/reference/include/srp-phat.cc:76-88)."""
    from setk_tpu.spatial.features import smooth_angular_spectrogram
    rng = np.random.default_rng(3)
    spec = rng.random((9, 5)).astype(np.float32)
    ctx = 2
    expect = np.zeros_like(spec)
    for t in range(spec.shape[0]):
        for c in range(-ctx, ctx + 1):
            expect[t] += spec[np.clip(t + c, 0, spec.shape[0] - 1)]
    expect /= 2 * ctx + 1
    got = np.asarray(smooth_angular_spectrogram(spec, ctx))
    np.testing.assert_allclose(got, expect, rtol=1e-6)
    # context 0 is the identity
    np.testing.assert_array_equal(
        np.asarray(smooth_angular_spectrogram(spec, 0)), spec)
    # batched input smooths along the time axis only
    bspec = rng.random((3, 9, 5)).astype(np.float32)
    got_b = np.asarray(smooth_angular_spectrogram(bspec, 1))
    for b in range(3):
        one = np.asarray(smooth_angular_spectrogram(bspec[b], 1))
        np.testing.assert_allclose(got_b[b], one, rtol=1e-6)
