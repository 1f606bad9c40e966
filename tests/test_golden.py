"""Golden-artifact integration tests against the reference's committed
doc assets (/root/reference/doc/*/asset) — the reference's own de-facto
integration tests (SURVEY.md §4.3)."""

import numpy as np
import pytest

from setk_tpu.dsp import StftConfig, forward_stft, inverse_stft
from setk_tpu.io.wave import read_wav

ASSET = "/root/reference/doc"
CFG = StftConfig(frame_len=512, frame_hop=256)


def _si_snr(x, s):
    n = min(len(x), len(s))
    x, s = x[:n] - x[:n].mean(), s[:n] - s[:n].mean()
    t = np.inner(x, s) * s / (np.linalg.norm(s)**2 + 1e-8)
    return 20 * np.log10(np.linalg.norm(t) / (np.linalg.norm(x - t) + 1e-8))


def test_ssl_finds_59_degrees():
    """doc/ssl/README.md: srp/ml/music all report ~59 deg on egs.wav."""
    from setk_tpu.spatial.steer import circular_steer_vector
    from setk_tpu.spatial import ssl
    wav = read_wav(f"{ASSET}/ssl/asset/egs.wav")  # 16-ch circular r=0.05
    assert wav.shape[0] == 16
    spec = np.asarray(forward_stft(wav, CFG))  # M x T x F
    doas = np.arange(360)
    sv = circular_steer_vector(0.05, 16, doas.astype(float), 257)  # A,F,M
    grid = np.ascontiguousarray(sv.transpose(0, 2, 1))  # A x M x F
    pair = ([0, 1, 2, 3, 4, 5, 6, 7], [8, 9, 10, 11, 12, 13, 14, 15])
    got_srp = int(ssl.srp_ssl(spec, grid, pair))
    got_ml = int(ssl.ml_ssl(spec, grid))
    got_music = int(ssl.music_ssl(spec, grid))
    for got in (got_srp, got_ml, got_music):
        assert abs(got - 59) <= 3, (got_srp, got_ml, got_music)


def test_wpe_matches_golden_waveform():
    """WPE is deterministic linear filtering (no phase ambiguity): our
    output should align closely with the committed wpe_egs.wav (which
    doc/wpe/README.md generates with --frame-len 512 --frame-hop 128)."""
    from setk_tpu.enhance.wpe import wpe
    cfg = StftConfig(frame_len=512, frame_hop=128)
    wav = read_wav(f"{ASSET}/wpe/asset/egs.wav")
    golden = read_wav(f"{ASSET}/wpe/asset/wpe_egs.wav")
    spec = np.asarray(forward_stft(wav, cfg))  # N x T x F
    obs = spec.transpose(2, 0, 1).astype(np.complex64)  # F x N x T
    der = np.asarray(wpe(obs, taps=10, delay=3, context=1, num_iters=3))
    out = np.asarray(
        inverse_stft(der.transpose(1, 2, 0), cfg,
                     nsamps=wav.shape[-1]))  # N x S
    ref_ch = golden if golden.ndim == 1 else golden[0]
    score = _si_snr(out[0], ref_ch)
    assert score > 15.0, f"Si-SNR vs golden wpe output: {score:.2f} dB"


def test_cgmm_mvdr_matches_golden_quality():
    """CGMM masks -> MVDR on the adaptive-beamformer egs; compare the
    enhanced magnitude spectrogram against the committed mvdr.wav (the
    waveform itself carries the reference's solver-dependent per-bin
    eigenvector phase, so magnitudes are the right parity surface)."""
    from setk_tpu.enhance.cluster import cgmm_em
    from setk_tpu.enhance import beamformer as bf
    wav = read_wav(f"{ASSET}/adaptive_beamformer/asset/egs.wav")
    golden = read_wav(f"{ASSET}/adaptive_beamformer/asset/mvdr.wav")
    spec = np.asarray(forward_stft(wav, CFG))
    obs = spec.transpose(2, 0, 1).astype(np.complex64)  # F x N x T
    gamma, _ = cgmm_em(obs, 2, num_iters=20)
    mask = np.asarray(gamma)[0]  # F x T speech mask
    enh = np.asarray(
        bf.supervised_run("mvdr", obs, mask.astype(np.float32)))
    out = np.asarray(
        inverse_stft(enh.T, CFG, nsamps=wav.shape[-1]))
    mag_ours = np.abs(np.asarray(forward_stft(out, CFG)))
    mag_gold = np.abs(np.asarray(forward_stft(
        golden if golden.ndim == 1 else golden[0], CFG)))
    t = min(mag_ours.shape[0], mag_gold.shape[0])
    a, b = mag_ours[:t].ravel(), mag_gold[:t].ravel()
    cos = np.inner(a, b) / (np.linalg.norm(a) * np.linalg.norm(b))
    assert cos > 0.95, f"magnitude cosine vs golden: {cos:.4f}"
