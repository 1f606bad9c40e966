"""Fourth CLI batch: WPD, circular classic beamformers + SRP, DF
features, oracle separation, similarity scoring, 2D RIR corpus,
spectrogram visualization.

Reference equivalents: apply_wpd.py, apply_classic_beamformer.py
(circular geometry + --utt2doa), compute_circular_srp.py,
compute_df_on_mask.py, compute_df_on_geometry.py, oracle_separate.py,
compute_similar_score.py, rir_generate_2d.py, visualize_spectrogram.py
under /root/reference/scripts/sptk/.
"""

import importlib
import json

import numpy as np
import pytest

from setk_tpu.dsp import StftConfig, forward_stft, inverse_stft
from setk_tpu.io import ArchiveWriter, NumpyWriter, ScriptReader
from setk_tpu.io.wave import read_wav, write_wav
from setk_tpu.spatial.steer import (circular_steer_vector,
                                    linear_steer_vector, steer_vector_grid)


def _cmd(name):
    return importlib.import_module(f"setk_tpu.cli.{name}")


def _run(name, argv):
    mod = _cmd(name)
    mod.run(mod.make_parser().parse_args(argv))


def _steered_corpus(root, sv, name="utt", snr_scale=0.01, seed=5):
    """Write an N-channel wav steered by sv (F x N) + white noise."""
    rng = np.random.default_rng(seed)
    sr = 16000
    t = np.arange(sr) / sr
    src = (np.sin(2 * np.pi * 430 * t) * 0.3).astype(np.float32)
    cfg = StftConfig()
    spec = np.asarray(forward_stft(src, cfg))  # T x F
    multi = sv.T[:, None, :] * spec[None]  # N x T x F
    wav = np.asarray(inverse_stft(multi, cfg, nsamps=sr))
    wav = wav + rng.standard_normal(wav.shape).astype(np.float32) * snr_scale
    for c in range(wav.shape[0]):
        write_wav(root / f"{name}.CH{c}.wav", wav[c], sr=sr)
    (root / "wav.scp").write_text(f"{name} {root}/{name}.CH*.wav\n")
    return wav


@pytest.fixture(scope="module")
def circ6(tmp_path_factory):
    """6-mic circular array (r=0.05), source at 60 degrees."""
    root = tmp_path_factory.mktemp("circ6")
    sv = circular_steer_vector(0.05, 6, 60.0, 257)
    _steered_corpus(root, sv)
    return root


@pytest.fixture(scope="module")
def lin4(tmp_path_factory):
    """4-mic linear array, source at 70 degrees."""
    root = tmp_path_factory.mktemp("lin4")
    sv = linear_steer_vector([0.0, 0.05, 0.1, 0.15], 70.0, 257)
    _steered_corpus(root, sv)
    return root


def test_classic_circular_and_utt2doa(circ6, tmp_path):
    for bf in ("ds", "sd"):
        out = tmp_path / bf
        _run("apply_classic_beamformer", [
            str(circ6 / "wav.scp"), str(out), "--beamformer", bf,
            "--geometry", "circular", "--circular-radius", "0.05",
            "--circular-around", "6", "--doa", "60"
        ])
        enh = read_wav(out / "utt.wav")
        assert enh.ndim == 1 and np.isfinite(enh).all()
    # per-utterance DoA table
    (tmp_path / "utt2doa").write_text("utt 60\n")
    _run("apply_classic_beamformer", [
        str(circ6 / "wav.scp"), str(tmp_path / "u2d"),
        "--geometry", "circular", "--circular-radius", "0.05",
        "--circular-around", "6", "--utt2doa", str(tmp_path / "utt2doa")
    ])
    a = read_wav(tmp_path / "ds" / "utt.wav")
    b = read_wav(tmp_path / "u2d" / "utt.wav")
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_apply_wpd_cli(lin4, tmp_path):
    _run("apply_wpd", [
        str(lin4 / "wav.scp"), str(tmp_path / "enh"),
        "--mask-dir", str(tmp_path / "mask"),
        "--taps", "4", "--delay", "2", "--cgmm-iters", "2",
        "--wpd-iters", "1"
    ])
    enh = read_wav(tmp_path / "enh" / "utt.wav")
    assert enh.ndim == 1 and np.isfinite(enh).all()
    mask = np.load(tmp_path / "mask" / "utt.npy")
    assert mask.ndim == 2 and mask.min() >= 0 and mask.max() <= 1 + 1e-5


def test_compute_circular_srp_cli(circ6, tmp_path):
    ark = tmp_path / "srp.ark"
    _run("compute_circular_srp", [
        str(circ6 / "wav.scp"), str(ark), "--scp",
        str(tmp_path / "srp.scp"), "--n", "6", "--d", "0.1",
        "--num-doas", "121"
    ])
    feats = {k: m for k, m in ScriptReader(tmp_path / "srp.scp")}
    srp = feats["utt"]
    assert srp.shape[-1] == 121 and np.isfinite(srp).all()


def test_compute_df_on_mask_cli(lin4, tmp_path):
    # oracle-ish mask: all ones (the source dominates the corpus)
    cfg = StftConfig()
    t_frames = cfg.num_frames(16000)
    with ArchiveWriter(str(tmp_path / "m.ark"),
                       str(tmp_path / "m.scp")) as w:
        w.write("utt", np.ones((t_frames, 257), dtype=np.float32))
    _run("compute_df_on_mask", [
        str(lin4 / "wav.scp"), str(tmp_path / "m.scp"),
        str(tmp_path / "df.ark"), "--scp", str(tmp_path / "df.scp"),
        "--df-pair", "0,1;0,2;0,3"
    ])
    df = {k: m for k, m in ScriptReader(tmp_path / "df.scp")}["utt"]
    assert df.shape == (t_frames, 257) and np.isfinite(df).all()
    # only the source-dominant bins (~430 Hz -> bin 430/31.25 ~ 14)
    # carry the steering phase; elsewhere cos(noise) averages to ~0
    assert df[:, 12:17].mean() > 0.5


def test_compute_df_on_geometry_cli(lin4, tmp_path):
    doas, grid = steer_vector_grid("linear", 19, 257,
                                   linear_topo=[0.0, 0.05, 0.1, 0.15])
    # CLI expects A x M x F
    np.save(tmp_path / "sv.npy",
            np.ascontiguousarray(grid.transpose(0, 2, 1)))
    (tmp_path / "utt2idx").write_text("utt 7\n")  # 7 -> 70 degrees
    _run("compute_df_on_geometry", [
        str(lin4 / "wav.scp"), str(tmp_path / "sv.npy"),
        str(tmp_path / "df.ark"), "--scp", str(tmp_path / "df.scp"),
        "--utt2idx", str(tmp_path / "utt2idx"),
        "--df-pair", "0,1;0,2;0,3"
    ])
    df = {k: m for k, m in ScriptReader(tmp_path / "df.scp")}["utt"]
    assert df.shape[-1] == 257 and np.isfinite(df).all()
    # high DF at the source-dominant bins (~430 Hz), see above
    assert df[:, 12:17].mean() > 0.5


def test_oracle_separate_cli(tmp_path):
    rng = np.random.default_rng(11)
    sr = 16000
    t = np.arange(sr) / sr
    s1 = (np.sin(2 * np.pi * 350 * t) * 0.3).astype(np.float32)
    s2 = (rng.standard_normal(sr) * 0.1).astype(np.float32)
    write_wav(tmp_path / "s1.wav", s1, sr=sr)
    write_wav(tmp_path / "s2.wav", s2, sr=sr)
    write_wav(tmp_path / "mix.wav", s1 + s2, sr=sr)
    (tmp_path / "mix.scp").write_text(f"utt {tmp_path}/mix.wav\n")
    (tmp_path / "s1.scp").write_text(f"utt {tmp_path}/s1.wav\n")
    (tmp_path / "s2.scp").write_text(f"utt {tmp_path}/s2.wav\n")
    _run("oracle_separate", [
        str(tmp_path / "mix.scp"),
        f"{tmp_path}/s1.scp,{tmp_path}/s2.scp",
        str(tmp_path / "sep"), "--mask", "irm"
    ])

    def si_snr(est, ref):
        est = est - est.mean()
        ref = ref - ref.mean()
        proj = (est @ ref) / (ref @ ref) * ref
        return 10 * np.log10((proj @ proj) / ((est - proj) @ (est - proj)))

    e1 = read_wav(tmp_path / "sep" / "utt.spk1.wav")
    e2 = read_wav(tmp_path / "sep" / "utt.spk2.wav")
    mix_snr = si_snr(s1 + s2, s1)
    assert si_snr(e1, s1) > mix_snr + 5
    assert si_snr(e2, s2) > 5


def test_compute_similar_score_cli(tmp_path, capsys):
    rng = np.random.default_rng(2)
    spk_a = rng.standard_normal(32).astype(np.float32)
    spk_b = rng.standard_normal(32).astype(np.float32)
    with NumpyWriter(str(tmp_path / "spks"),
                     str(tmp_path / "spks.scp")) as w:
        w.write("spkA", spk_a)
        w.write("spkB", spk_b)
    with NumpyWriter(str(tmp_path / "eval"),
                     str(tmp_path / "eval.scp")) as w:
        w.write("utt1", spk_a + 0.01)  # near-duplicate of spkA
    (tmp_path / "utt2spk").write_text("utt1 spkA\n")
    _run("compute_similar_score", [
        str(tmp_path / "spks.scp"), str(tmp_path / "eval.scp"),
        "--utt2spk", str(tmp_path / "utt2spk"),
        "--vector-type", "numpy", "--normalize", "true"
    ])
    lines = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
    scores = {l.split()[1]: float(l.split()[0]) for l in lines}
    assert scores["target"] > 0.99
    assert scores["target"] > scores["nontarget"]


def test_rir_generate_2d_cli(tmp_path):
    _run("rir_generate_2d", [
        "--dump-dir", str(tmp_path / "rirs"), "--num-rooms", "1",
        "--num-rirs", "1", "--rir-dur", "0.15",
        "--room-dim", "4,5;4,5;2.5,3", "--rt60", "0.2,0.3",
        "--array-topo", "0,0;0.1,0;0,0.1", "--seed", "17"
    ])
    cfg = json.loads((tmp_path / "rirs" / "rir.json").read_text())
    assert len(cfg) == 1
    wavs = list((tmp_path / "rirs").rglob("*.wav"))
    assert wavs, "no RIR wav dumped"
    rir = read_wav(wavs[0])
    assert np.isfinite(rir).all() and np.abs(rir).max() > 0


def test_visualize_spectrogram_cli(tmp_path, rng):
    wav = (rng.standard_normal(16000) * 0.1).astype(np.float32)
    write_wav(tmp_path / "u.wav", wav, sr=16000)
    (tmp_path / "wav.scp").write_text(f"u1 {tmp_path}/u.wav\n")
    _run("visualize_spectrogram", [
        str(tmp_path / "wav.scp"), "--cache-dir", str(tmp_path / "figs")
    ])
    assert (tmp_path / "figs" / "u1.png").exists()


def test_apply_wpe_batched_matches_single(lin4, tmp_path):
    """--batch-size routes through BatchWpe and matches the
    per-utterance path."""
    _run("apply_wpe", [
        str(lin4 / "wav.scp"), str(tmp_path / "one"),
        "--taps", "4", "--delay", "2", "--num-iters", "2"
    ])
    _run("apply_wpe", [
        str(lin4 / "wav.scp"), str(tmp_path / "bat"),
        "--taps", "4", "--delay", "2", "--num-iters", "2",
        "--batch-size", "4"
    ])
    one = read_wav(tmp_path / "one" / "utt.wav")
    bat = read_wav(tmp_path / "bat" / "utt.wav")
    assert one.shape == bat.shape and np.isfinite(bat).all()
    # the two paths pad differently (frame bucket vs sample bucket), so
    # the estimated filters differ slightly — same dereverb up to that
    corr = np.corrcoef(one.ravel(), bat.ravel())[0, 1]
    assert corr > 0.99
