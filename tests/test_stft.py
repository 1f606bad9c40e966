"""STFT/iSTFT parity and property tests.

torch.stft/istft (CPU) serve as the cross-implementation oracle: for
center=True + hann they implement the same analysis/synthesis semantics as
librosa 0.8.1, which the reference toolkit wraps
(/root/reference/scripts/sptk/libs/utils.py:96-173).
"""

import numpy as np
import pytest
import torch

from setk_tpu.dsp import (StftConfig, forward_stft, inverse_stft,
                          num_frames, mel_filterbank)
from setk_tpu.dsp.window import make_window, pad_center
from setk_tpu.dsp.griffin_lim import griffin_lim


def _torch_stft(x, cfg):
    win = torch.from_numpy(make_window(cfg.window, cfg.frame_len))
    spec = torch.stft(torch.from_numpy(x),
                      n_fft=cfg.n_fft,
                      hop_length=cfg.frame_hop,
                      win_length=cfg.frame_len,
                      window=win,
                      center=cfg.center,
                      pad_mode="reflect",
                      return_complex=True)
    return spec.numpy()  # F x T


@pytest.mark.parametrize("frame_len,frame_hop,window,center,rp2", [
    (512, 256, "hann", True, True),
    (512, 256, "hann", False, True),
    (400, 160, "hamming", True, True),
    (512, 128, "sqrthann", True, True),
    (256, 64, "blackman", True, False),
])
def test_forward_stft_matches_torch(rng, frame_len, frame_hop, window,
                                    center, rp2):
    cfg = StftConfig(frame_len=frame_len, frame_hop=frame_hop, window=window,
                     center=center, round_power_of_two=rp2)
    x = rng.standard_normal(8000).astype(np.float32)
    ours = np.asarray(forward_stft(x, cfg))  # T x F
    ref = _torch_stft(x, cfg).T  # T x F
    assert ours.shape == ref.shape
    assert ours.shape[-1] == cfg.num_bins
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-4)


def test_num_frames(rng):
    cfg = StftConfig()
    for n in (4096, 5000, 8192):
        x = rng.standard_normal(n).astype(np.float32)
        assert forward_stft(x, cfg).shape[0] == num_frames(n, cfg)


@pytest.mark.parametrize("frame_len,frame_hop,window", [
    (512, 256, "hann"),
    (512, 128, "hann"),
    (512, 256, "sqrthann"),
])
def test_roundtrip(rng, frame_len, frame_hop, window):
    cfg = StftConfig(frame_len=frame_len, frame_hop=frame_hop, window=window)
    # hop-aligned length => all samples fully covered by analysis frames
    # (like librosa, trailing partial-hop samples cannot be reconstructed)
    x = rng.standard_normal(6144).astype(np.float32)
    spec = forward_stft(x, cfg)
    y = np.asarray(inverse_stft(spec, cfg, nsamps=6144))
    np.testing.assert_allclose(y, x, atol=1e-4)


def test_roundtrip_no_center(rng):
    cfg = StftConfig(center=False)
    x = rng.standard_normal(8192).astype(np.float32)
    spec = forward_stft(x, cfg)
    y = np.asarray(inverse_stft(spec, cfg))
    # edges lack full overlap when center=False; compare interior
    n_fft = cfg.n_fft
    np.testing.assert_allclose(y[n_fft:-n_fft], x[n_fft:y.shape[0] - n_fft],
                               atol=1e-4)


def test_istft_matches_torch(rng):
    cfg = StftConfig(frame_len=512, frame_hop=256, center=True)
    x = rng.standard_normal(8000).astype(np.float32)
    spec_ft = _torch_stft(x, cfg)  # F x T
    # random modification to make the test non-trivial (not a consistent STFT)
    spec_ft = spec_ft * (0.5 + rng.random(spec_ft.shape))
    win = torch.from_numpy(make_window(cfg.window, cfg.frame_len))
    ref = torch.istft(torch.from_numpy(spec_ft), n_fft=cfg.n_fft,
                      hop_length=cfg.frame_hop, win_length=cfg.frame_len,
                      window=win, center=True, length=8000).numpy()
    ours = np.asarray(inverse_stft(spec_ft.T.astype(np.complex64), cfg,
                                   nsamps=8000))
    # torch.istft end-trims after satisfying `length` whereas librosa (our
    # semantics) trims n_fft//2 from both ends first; compare the region
    # where both definitions agree.
    n_frames = spec_ft.shape[1]
    common = cfg.n_fft + cfg.frame_hop * (n_frames - 1) - cfg.n_fft
    np.testing.assert_allclose(ours[:common], ref[:common], atol=2e-4)


def test_batched_matches_loop(rng):
    cfg = StftConfig()
    x = rng.standard_normal((3, 4, 5000)).astype(np.float32)
    batched = np.asarray(forward_stft(x, cfg))
    for i in range(3):
        for j in range(4):
            single = np.asarray(forward_stft(x[i, j], cfg))
            np.testing.assert_allclose(batched[i, j], single, atol=1e-5)


def test_norm_and_power_renorm(rng):
    cfg = StftConfig()
    x = rng.standard_normal(5000).astype(np.float32)
    spec = forward_stft(x, cfg)
    y = np.asarray(inverse_stft(spec, cfg, norm=0.9))
    assert abs(np.abs(y).max() - 0.9) < 1e-3
    y = np.asarray(inverse_stft(spec, cfg, power=0.1))
    assert abs((y**2).mean() - 0.1) < 1e-3


def test_mel_filterbank_shape_and_coverage():
    fb = mel_filterbank(16000, 512, num_mels=40, fmin=0, fmax=8000)
    assert fb.shape == (40, 257)
    # every filter has some energy; interior bins covered
    assert (fb.sum(axis=1) > 0).all()


def test_griffin_lim_converges(rng):
    cfg = StftConfig(frame_len=256, frame_hop=64, round_power_of_two=False)
    t = np.arange(4000) / 16000.0
    x = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    mag = np.abs(np.asarray(forward_stft(x, cfg)))
    y = np.asarray(griffin_lim(mag, cfg, epochs=100))
    mag_y = np.abs(np.asarray(forward_stft(y, cfg)))
    # spectral convergence: reconstructed magnitudes close to target
    err = np.linalg.norm(mag_y - mag) / np.linalg.norm(mag)
    assert err < 0.15


@pytest.mark.parametrize("frame_len,frame_hop,window,center,rp2", [
    (512, 256, "hann", True, True),
    (512, 128, "sqrthann", True, True),
    (400, 160, "hamming", True, True),   # n_fft 512, hop not a divisor
    (256, 64, "blackman", False, False),
])
def test_matmul_dft_matches_fft(rng, frame_len, frame_hop, window, center,
                                rp2):
    """The MXU DFT-matmul path (dsp/dft.py) vs jnp.fft, forward and
    inverse, to float32 parity tolerance."""
    cfg = StftConfig(frame_len=frame_len, frame_hop=frame_hop,
                     window=window, center=center, round_power_of_two=rp2)
    x = rng.standard_normal((2, 3 * 16000)).astype(np.float32)
    ref = np.asarray(forward_stft(x, cfg, impl="fft"))
    got = np.asarray(forward_stft(x, cfg, impl="matmul"))
    scale = np.abs(ref).max()
    np.testing.assert_allclose(got, ref, atol=2e-5 * scale, rtol=0)
    inv_ref = np.asarray(inverse_stft(ref, cfg, impl="fft",
                                      nsamps=x.shape[-1]))
    inv_got = np.asarray(inverse_stft(ref, cfg, impl="matmul",
                                      nsamps=x.shape[-1]))
    # zero-endpoint windows without centering make the first/last frame
    # edge samples unreconstructable in ANY implementation (the window
    # envelope vanishes there) — compare the well-conditioned interior
    e = 0 if center else cfg.n_fft
    s = np.s_[..., e:inv_ref.shape[-1] - e]
    np.testing.assert_allclose(inv_got[s], inv_ref[s], atol=2e-5, rtol=0)
