"""Second golden-parity batch against /root/reference/doc assets.

Covers the remaining committed artifacts: the adaptive-beamformer
variant wavs (gevd / gevd-ban / pmwf-0 / pmwf-0-eig / pmwf-0-gev, all
produced by doc/adaptive_beamformer/README.md from CGMM masks), the
format_transform kaldi archive, and the VAD golden output."""

import numpy as np
import pytest

from setk_tpu.dsp import StftConfig, forward_stft, inverse_stft
from setk_tpu.io.wave import read_wav

ASSET = "/root/reference/doc"
CFG = StftConfig(frame_len=512, frame_hop=256)


@pytest.fixture(scope="module")
def beamformer_egs():
    """CGMM speech mask for the adaptive-beamformer example, shared by
    all variant tests (doc/adaptive_beamformer/README.md runs
    estimate_cgmm_masks once, then each beamformer on the same mask)."""
    from setk_tpu.enhance.cluster import cgmm_em
    wav = read_wav(f"{ASSET}/adaptive_beamformer/asset/egs.wav")
    spec = np.asarray(forward_stft(wav, CFG))
    obs = spec.transpose(2, 0, 1).astype(np.complex64)  # F x N x T
    gamma, _ = cgmm_em(obs, 2, num_iters=20)
    mask = np.asarray(gamma)[0].astype(np.float32)  # F x T speech mask
    return wav, obs, mask


def _mag_cosine(out, golden):
    mag_ours = np.abs(np.asarray(forward_stft(out, CFG)))
    mag_gold = np.abs(np.asarray(forward_stft(
        golden if golden.ndim == 1 else golden[0], CFG)))
    t = min(mag_ours.shape[0], mag_gold.shape[0])
    a, b = mag_ours[:t].ravel(), mag_gold[:t].ravel()
    return np.inner(a, b) / (np.linalg.norm(a) * np.linalg.norm(b))


@pytest.mark.parametrize("name,golden_file,kwargs", [
    ("gevd", "gevd.wav", {}),
    ("gevd", "gevd-ban.wav", {"ban": True}),
    ("pmwf-0", "pmwf-0.wav", {}),
    ("pmwf-0", "pmwf-0-eig.wav", {"rank1_appro": "eig"}),
    ("pmwf-0", "pmwf-0-gev.wav", {"rank1_appro": "gev"}),
])
def test_beamformer_variant_matches_golden(beamformer_egs, name,
                                           golden_file, kwargs):
    """Each beamformer variant vs its committed wav.  The per-bin
    eigenvector phase is solver-dependent, so (as with the mvdr golden
    test) the parity surface is the enhanced magnitude spectrogram."""
    from setk_tpu.enhance import beamformer as bf
    wav, obs, mask = beamformer_egs
    golden = read_wav(f"{ASSET}/adaptive_beamformer/asset/{golden_file}")
    enh = np.asarray(bf.supervised_run(name, obs, mask, **kwargs))
    out = np.asarray(inverse_stft(enh.T, CFG, nsamps=wav.shape[-1]))
    cos = _mag_cosine(out, golden)
    # raw GEVD: our weights are phase-anchored to channel 0 (the
    # standard GEV phase correction; deterministic output) while the
    # golden wav carries scipy-eigh's arbitrary per-bin phases — the
    # differing overlap-add interference costs ~0.007 of magnitude
    # cosine.  BAN (the recommended GEVD companion) restores 0.93+.
    floor = 0.92 if golden_file == "gevd.wav" else 0.93
    assert cos > floor, f"{golden_file}: magnitude cosine {cos:.4f}"


def test_kaldi_ark_read_matches_reference_codec():
    """doc/format_transform/asset/egs.ark read by our codec vs the
    reference's kaldi_io (scripts/sptk/libs/kaldi_io.py:364-376)."""
    import tests.reference_oracle  # noqa: F401 (sets sys.path + stubs)
    from sptk.libs import kaldi_io as ref_kaldi_io
    from setk_tpu.io import kaldi
    path = f"{ASSET}/format_transform/asset/egs.ark"
    with open(path, "rb") as fd:
        ours = {k: m for k, m in kaldi.read_ark(fd)}
    with open(path, "rb") as fd:
        ref = {k: m for k, m in ref_kaldi_io.read_float_ark(fd)}
    assert sorted(ours) == sorted(ref) and len(ours) > 0
    for key in ref:
        np.testing.assert_allclose(ours[key], ref[key], rtol=1e-6)


def test_vad_matches_golden_duration():
    """doc/vad/README.md removes silence from utt.wav with webrtcvad
    (not in this image); our energy VAD with the same hangover state
    machine should keep a comparable amount of speech."""
    from setk_tpu.enhance.vad import remove_silence
    utt = read_wav(f"{ASSET}/vad/asset/utt.wav")
    golden = read_wav(f"{ASSET}/vad/asset/utt_vad.wav")
    kept, segments = remove_silence(utt, sr=16000)
    assert kept.size > 0 and len(segments) > 0
    ratio = kept.shape[-1] / golden.shape[-1]
    assert 0.6 < ratio < 1.6, f"kept/golden duration ratio {ratio:.2f}"
