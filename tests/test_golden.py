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
    # measured 43.0 dB on 2026-08-19; ratcheted from the round-1 15 dB
    # floor so regressions cannot hide in the slack (VERDICT r1 #8)
    assert score > 38.0, f"Si-SNR vs golden wpe output: {score:.2f} dB"


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
    # measured 0.9655 on 2026-08-19; ratcheted from 0.95 (VERDICT r1 #8)
    assert cos > 0.96, f"magnitude cosine vs golden: {cos:.4f}"


def test_psm_masking_matches_golden_enhan():
    """doc/tf_mask/README.md usage 3: PSM (cutoff 2) from clean+noisy,
    applied with noisy phase -> committed enhan.wav (deterministic)."""
    from setk_tpu.enhance.masks import compute_mask
    clean = read_wav(f"{ASSET}/tf_mask/asset/clean.wav")
    noisy = read_wav(f"{ASSET}/tf_mask/asset/noisy.wav")
    golden = read_wav(f"{ASSET}/tf_mask/asset/enhan.wav")
    s_c = np.asarray(forward_stft(clean, CFG))
    s_n = np.asarray(forward_stft(noisy, CFG))
    psm = np.clip(np.asarray(compute_mask(s_c, s_n, "psm")), 0, 2)
    enh = np.asarray(inverse_stft(psm * s_n, CFG, nsamps=noisy.shape[-1]))
    score = _si_snr(enh, golden)
    assert score > 40.0, f"Si-SNR vs golden enhan.wav: {score:.2f} dB"


def test_omlsa_matches_golden_ns():
    """doc/ns/README.md: iMCRA OM-LSA on egs.wav -> committed egs_ns.wav.
    The frame recursions are deterministic, so waveforms align closely
    (measured ~74 dB Si-SNR despite the vectorized exp1)."""
    from setk_tpu.enhance.ns import omlsa
    egs = read_wav(f"{ASSET}/ns/asset/egs.wav")
    golden = read_wav(f"{ASSET}/ns/asset/egs_ns.wav")
    sp = np.asarray(forward_stft(egs, CFG))
    gain = np.asarray(omlsa(sp, estimator="imcra"))
    out = np.asarray(inverse_stft(gain * sp, CFG, nsamps=egs.shape[-1]))
    score = _si_snr(out, golden)
    assert score > 40.0, f"Si-SNR vs golden egs_ns.wav: {score:.2f} dB"


def test_fixed_beamformer_matches_golden_ds_sd():
    """doc/fixed_beamformer/README.md: 4-mic circular array, SRP SSL
    reports 100 degrees, DS/SD outputs match the committed wavs."""
    from setk_tpu.spatial.steer import (circular_steer_vector,
                                        circular_distance_matrix,
                                        diffuse_covar)
    from setk_tpu.spatial import ssl
    from setk_tpu.enhance import beamformer as bf
    egs = read_wav(f"{ASSET}/fixed_beamformer/asset/egs.wav")
    golden_ds = read_wav(f"{ASSET}/fixed_beamformer/asset/ds.wav")
    golden_sd = read_wav(f"{ASSET}/fixed_beamformer/asset/sd.wav")
    spec = np.asarray(forward_stft(egs, CFG))  # M x T x F
    doas = np.arange(360).astype(float)
    sv = circular_steer_vector(0.05, 4, doas, 257)  # A x F x M
    grid = np.ascontiguousarray(sv.transpose(0, 2, 1))  # A x M x F
    doa = int(ssl.srp_ssl(spec, grid, ([0, 1], [2, 3])))
    assert abs(doa - 100) <= 2, f"srp doa: {doa}"
    obs = spec.transpose(2, 0, 1).astype(np.complex64)  # F x M x T
    steer = sv[doa]
    out_ds = np.asarray(inverse_stft(
        np.asarray(bf.beamform(np.asarray(bf.ds_weights(steer)), obs)).T,
        CFG, nsamps=egs.shape[-1]))
    score_ds = _si_snr(out_ds, golden_ds)
    assert score_ds > 40.0, f"DS Si-SNR vs golden: {score_ds:.2f} dB"
    rn = np.asarray(diffuse_covar(257, circular_distance_matrix(0.05, 4)))
    out_sd = np.asarray(inverse_stft(
        np.asarray(bf.beamform(np.asarray(bf.sd_weights(steer, rn)),
                               obs)).T, CFG, nsamps=egs.shape[-1]))
    score_sd = _si_snr(out_sd, golden_sd)
    # measured 28.0 dB on 2026-08-20; ratcheted from the round-1 15 dB
    # floor so regressions cannot hide in the slack (VERDICT r1 #8)
    assert score_sd > 25.0, f"SD Si-SNR vs golden: {score_sd:.2f} dB"
