"""Golden parity tests vs the remaining reference doc assets: steer
vectors / beam patterns, spatial clustering on real multichannel audio,
spatial + spectral features on the committed example wavs, data
simulation invariants, and the RIR corpus JSON schema.

Assets under /root/reference/doc/{steer_vector,spatial_clustering,
spatial_feature,spectral_feature,data_simu,rir}/asset.
"""

import importlib
import json
from pathlib import Path

import numpy as np
import pytest

import reference_oracle as ro

from setk_tpu.dsp import StftConfig, forward_stft
from setk_tpu.io.wave import read_wav, write_wav
from setk_tpu.spatial.steer import steer_vector_grid

DOC = Path("/root/reference/doc")


def _cmd(name):
    return importlib.import_module(f"setk_tpu.cli.{name}")


def _run(name, argv):
    mod = _cmd(name)
    mod.run(mod.make_parser().parse_args(argv))


def test_steer_vector_doc_parity(tmp_path):
    """doc/steer_vector/README.md usages 1+2: exact grids vs the
    reference steer-vector math (libs/beamformer.py:168-213)."""
    _run("compute_steer_vector", [
        str(tmp_path / "1d.npy"), "--geometry", "linear", "--num-doas",
        "181", "--num-bins", "257", "--linear-topo",
        "0,0.01,0.02,0.03,0.04,0.05"
    ])
    sv = np.load(tmp_path / "1d.npy")
    assert sv.shape == (181, 6, 257)
    topo = np.array([0, 0.01, 0.02, 0.03, 0.04, 0.05])
    for doa in (0, 59, 90, 180):
        ref = ro.ref_beamformer.linear_steer_vector(topo, doa, 257)  # F x N
        np.testing.assert_allclose(sv[doa], ref.T, atol=1e-5)
    _run("compute_steer_vector", [
        str(tmp_path / "2d.npy"), "--geometry", "circular", "--num-doas",
        "360", "--num-bins", "257", "--circular-radius", "0.05",
        "--circular-around", "4", "--circular-center", "false"
    ])
    sv2 = np.load(tmp_path / "2d.npy")
    assert sv2.shape == (360, 4, 257)
    for doa in (0, 100, 271):
        # the reference ships c=349 as the circular default (a typo kept
        # out of our API); pin c=340 on their side for the comparison
        ref = ro.ref_beamformer.circular_steer_vector(0.05, 4, doa, 257,
                                                      c=340)
        np.testing.assert_allclose(sv2[doa], ref.T, atol=1e-5)


def test_beampattern_on_committed_weights(tmp_path):
    """doc/steer_vector/README.md usage 3: the committed beam_v1.npy
    weights render against our 4-mic circular steering grid."""
    w = np.load(DOC / "steer_vector/asset/beam_v1.npy")  # F x N
    assert w.shape == (257, 4)
    np.save(tmp_path / "w.npy", w)
    _, grid = steer_vector_grid("circular", 360, 257, circular_radius=0.05,
                                circular_around=4)
    np.save(tmp_path / "sv.npy", np.ascontiguousarray(
        grid.transpose(0, 2, 1)))  # A x M x F
    _run("visualize_beampattern", [
        str(tmp_path / "w.npy"), str(tmp_path / "sv.npy"),
        "--doa-range", "360", "--cache-dir", str(tmp_path / "figs")
    ])
    assert (tmp_path / "figs" / "beam-0.png").exists()


@pytest.mark.slow
def test_cgmm_golden_on_noisy_asset():
    """doc/spatial_clustering/README.md usage 2 (enhancement): CGMM K=2
    on the committed 5-ch noisy.wav; masks match the reference EM run on
    the identical STFT (deterministic K=2 init, cluster.py:419-426)."""
    from setk_tpu.enhance.cluster import cgmm_em
    wav = read_wav(DOC / "spatial_clustering/asset/noisy.wav")
    cfg = StftConfig()
    obs_mft = np.asarray(forward_stft(wav[:, :64000], cfg)).transpose(
        0, 2, 1)  # M x F x T
    trainer = ro.ref_cluster.CgmmTrainer(obs_mft, 2)
    ref_gamma = trainer.train(8)  # K x F x T
    obs_fmt = obs_mft.transpose(1, 0, 2).astype(np.complex64)
    ours, q_hist = cgmm_em(obs_fmt, 2, num_iters=8)
    ours = np.asarray(ours)
    assert q_hist[-1] > q_hist[0]
    # same deterministic init -> same posterior trajectory
    assert np.mean(np.abs(ours - ref_gamma)) < 2e-2


def test_spatial_features_on_egs_asset():
    """doc/spatial_feature/README.md: IPD + DF on the committed 5-ch
    egs.wav equal the reference features on the identical spectrogram."""
    from setk_tpu.spatial.features import ipd, directional_feats
    wav = read_wav(DOC / "spatial_feature/asset/egs.wav")
    cfg = StftConfig()
    spec = np.asarray(forward_stft(wav[:, :48000], cfg))  # M x T x F
    # doc usage: --ipd.pair 0,4;1,4;2,4;3,4
    for (l, r) in [(0, 4), (1, 4), (2, 4)]:
        ref = ro.ref_spatial.ipd(spec[l].T, spec[r].T, cos=True)  # T x F
        got = np.asarray(ipd(spec[l].T, spec[r].T, cos=True))
        np.testing.assert_allclose(got, ref.T if ref.shape != got.shape
                                   else ref, atol=1e-4)
    # DF against a linear steering grid (doc df.jpg flow); both sides
    # take steer_vector as M x F
    sv = ro.ref_beamformer.linear_steer_vector(
        np.array([0, 0.02, 0.04, 0.06, 0.08]), 120, 257).T  # M x F
    ref_df = ro.ref_spatial.directional_feats(spec.transpose(0, 2, 1),
                                              sv, df_pair=[(0, 4), (1, 3)])
    got_df = np.asarray(directional_feats(spec.transpose(0, 2, 1), sv,
                                          df_pair=[(0, 4), (1, 3)]))
    np.testing.assert_allclose(got_df, ref_df, atol=1e-4)


def test_spectral_feature_egs_asset(tmp_path):
    """doc/spectral_feature/README.md: 257-dim log spectrogram + 80-dim
    fbank from the committed egs.wav (shape + finiteness + doc dims)."""
    (tmp_path / "wav.scp").write_text(
        f"egs {DOC}/spectral_feature/asset/egs.wav\n")
    _run("compute_spectrogram", [
        str(tmp_path / "wav.scp"), str(tmp_path / "spec.ark"), "--scp",
        str(tmp_path / "spec.scp"), "--apply-log", "true"
    ])
    from setk_tpu.io import ScriptReader
    spec = {k: m for k, m in ScriptReader(tmp_path / "spec.scp")}["egs"]
    cfg = StftConfig()
    assert spec.shape == (cfg.num_frames(103551), 257)
    assert np.isfinite(spec).all()
    _run("compute_fbank", [
        str(tmp_path / "wav.scp"), str(tmp_path / "fbank.ark"), "--scp",
        str(tmp_path / "fbank.scp"), "--num-bins", "80", "--log", "true"
    ])
    fbank = {k: m for k, m in ScriptReader(tmp_path / "fbank.scp")}["egs"]
    assert fbank.shape == (cfg.num_frames(103551), 80)
    assert np.isfinite(fbank).all()


def test_data_simu_reverb_channel_invariant(tmp_path):
    """doc/data_simu/README.md usage 1: convolving with channel 2 of the
    4-ch RIR equals simulating with the full RIR and dumping channel 1
    (0-based channel 1 = sox remix 2)."""
    rir = read_wav(DOC / "data_simu/asset/4ch-rir1.wav")  # 4 x L
    write_wav(tmp_path / "rir-ch2.wav", rir[1], sr=16000)
    _run("wav_simulate", [
        str(tmp_path / "reverb1.wav"), "--src-spk",
        str(DOC / "data_simu/asset/spk1.wav"), "--src-rir",
        str(tmp_path / "rir-ch2.wav")
    ])
    _run("wav_simulate", [
        str(tmp_path / "reverb2.wav"), "--src-spk",
        str(DOC / "data_simu/asset/spk1.wav"), "--src-rir",
        str(DOC / "data_simu/asset/4ch-rir1.wav"), "--dump-channel", "1"
    ])
    r1 = read_wav(tmp_path / "reverb1.wav")
    r2 = read_wav(tmp_path / "reverb2.wav")
    assert r1.ndim == 1
    np.testing.assert_allclose(r1, r2, atol=2e-4)


def test_data_simu_far_field_snr(tmp_path):
    """doc/data_simu/README.md usage 2: far-field + point noise at 5 dB
    + isotropic at 8 dB produces a 4-ch mixture; the direct-path SNR
    between reverbed speech and point noise is ~5 dB by construction."""
    _run("wav_simulate", [
        str(tmp_path / "noisy.wav"), "--src-spk",
        str(DOC / "data_simu/asset/spk1.wav"), "--src-rir",
        str(DOC / "data_simu/asset/4ch-rir1.wav"), "--point-noise",
        str(DOC / "data_simu/asset/noise.wav"), "--point-noise-snr", "5",
        "--point-noise-rir", str(DOC / "data_simu/asset/4ch-rir3.wav"),
        "--isotropic-noise", str(DOC / "data_simu/asset/iso.wav"),
        "--isotropic-noise-snr", "8", "--isotropic-noise-offset", "16000",
        "--dump-ref-dir", str(tmp_path / "ref")
    ])
    mix = read_wav(tmp_path / "noisy.wav")
    assert mix.shape[0] == 4 and np.isfinite(mix).all()
    assert abs(np.abs(mix).max() - 0.9) < 2e-3  # norm-factor 0.9
    # the reference dumps channel-0 references (wav_simulate.py:307)
    spk = read_wav(tmp_path / "ref" / "clean" / "noisy.wav")
    assert spk.shape == (mix.shape[-1],)
    noise = read_wav(tmp_path / "ref" / "noise" / "noisy.wav")
    assert noise.shape == (mix.shape[-1],)


def test_rir_json_schema_drives_our_engine():
    """doc/rir/asset/1d_rir.json: the reference generator's dumped room
    configs drive our image-method engine; direct-path peak lands at
    distance/c and the tail decays."""
    from setk_tpu.sim.rir import rir_generate_native
    cfgs = json.loads((DOC / "rir/asset/1d_rir.json").read_text())
    assert len(cfgs) == 2
    room = cfgs[0]
    mics = np.asarray(room["receiver_location"])
    spk = room["spk"][0]
    sr = 16000
    rir = rir_generate_native(room["room_size"], spk["pos"], mics, sr=sr,
                              beta=np.full(6, room["beta"]),
                              num_samples=sr // 4)
    assert rir.shape[0] == mics.shape[0]
    d = np.linalg.norm(np.asarray(spk["pos"]) - mics[0])
    peak = np.argmax(np.abs(rir[0]))
    assert abs(peak - d / 340.0 * sr) < 32  # within 2 ms of direct path
    head = np.abs(rir[0][:sr // 16]).max()
    tail = np.abs(rir[0][-sr // 50:]).max()
    assert tail < head * 0.5
