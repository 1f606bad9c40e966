"""Third CLI batch: metrics (wer/sdr), visualize commands, complex-mat
transforms, dpcl labels, centroids, online beamformer, nn-mask recipe."""

import importlib

import numpy as np
import pytest

from setk_tpu.io.wave import write_wav, read_wav
from setk_tpu.io import parse_scps, ScriptReader, NumpyWriter


def _run(name, argv):
    mod = importlib.import_module(f"setk_tpu.cli.{name}")
    mod.run(mod.make_parser().parse_args(argv))


def test_compute_wer_cli(tmp_path, capsys):
    (tmp_path / "hyp.scp").write_text("u1 a b c\nu2 x y\n")
    (tmp_path / "ref.scp").write_text("u1 a b d\nu2 x y\n")
    _run("compute_wer", [str(tmp_path / "hyp.scp"),
                         str(tmp_path / "ref.scp"),
                         "--per-utt", str(tmp_path / "per_utt")])
    out = capsys.readouterr().out
    assert "Total WER: 20.00%" in out  # 1 error / 5 ref words
    per = parse_scps(str(tmp_path / "per_utt"))
    assert abs(float(per["u1"]) - 1 / 3) < 1e-3


def test_compute_sdr_cli(tmp_path, rng, capsys):
    sr = 16000
    s = (rng.standard_normal(sr) * 0.2).astype(np.float32)
    write_wav(tmp_path / "ref.wav", s, sr=sr)
    write_wav(tmp_path / "est.wav", s + 0.02 * rng.standard_normal(sr)
              .astype(np.float32), sr=sr)
    (tmp_path / "ref.scp").write_text(f"u1 {tmp_path}/ref.wav\n")
    (tmp_path / "est.scp").write_text(f"u1 {tmp_path}/est.wav\n")
    _run("compute_sdr", [str(tmp_path / "est.scp"),
                         str(tmp_path / "ref.scp")])
    out = capsys.readouterr().out
    sdr = float(out.split("SDR:")[1].split("dB")[0])
    assert sdr > 15


def test_visualize_commands(tmp_path, rng):
    mask = rng.random((40, 257)).astype(np.float32)
    with NumpyWriter(str(tmp_path / "m"), str(tmp_path / "m.scp")) as w:
        w.write("u1", mask)
    _run("visualize_tf_matrix", [str(tmp_path / "m.scp"),
                                 "--input", "numpy",
                                 "--cache-dir", str(tmp_path / "figs")])
    assert (tmp_path / "figs" / "u1.png").exists()
    spec = rng.random((40, 181)).astype(np.float32)
    with NumpyWriter(str(tmp_path / "a"), str(tmp_path / "a.scp")) as w:
        w.write("u1", spec)
    _run("visualize_angular_spectrum", [str(tmp_path / "a.scp"),
                                        "--input", "numpy",
                                        "--cache-dir",
                                        str(tmp_path / "figs2")])
    assert (tmp_path / "figs2" / "u1.png").exists()
    # beampattern from steer grid + weights
    from setk_tpu.spatial.steer import linear_steer_vector
    topo = [0.0, 0.05, 0.1, 0.15]
    sv = linear_steer_vector(topo, np.linspace(0, 180, 19), 257)  # A,F,N
    np.save(tmp_path / "sv.npy", np.ascontiguousarray(
        sv.transpose(0, 2, 1)))
    np.save(tmp_path / "w.npy",
            (linear_steer_vector(topo, 90.0, 257) / 4).astype(np.complex64))
    _run("visualize_beampattern", [str(tmp_path / "w.npy"),
                                   str(tmp_path / "sv.npy"),
                                   "--cache-dir", str(tmp_path / "figs3")])
    assert (tmp_path / "figs3" / "beam-0.png").exists()


def test_visualize_pca(tmp_path, rng):
    with NumpyWriter(str(tmp_path / "e"), str(tmp_path / "e.scp")) as w:
        for i in range(8):
            w.write(f"u{i}", rng.standard_normal(16).astype(np.float32))
    (tmp_path / "u2c").write_text(
        "\n".join(f"u{i} spk{i % 2}" for i in range(8)) + "\n")
    _run("visualize_pca", [str(tmp_path / "e.scp"),
                           str(tmp_path / "pca.png"),
                           "--input", "numpy",
                           "--utt2class", str(tmp_path / "u2c")])
    assert (tmp_path / "pca.png").exists()


def test_copy_complex_mat(tmp_path, rng):
    import scipy.io as sio
    cmat = (rng.standard_normal((4, 5)) +
            1j * rng.standard_normal((4, 5))).astype(np.complex64)
    sio.savemat(tmp_path / "in.mat", {"data": cmat})
    _run("copy_complex_mat", [str(tmp_path / "in.mat"),
                              str(tmp_path / "out.cmat")])
    from setk_tpu.io import kaldi
    with open(tmp_path / "out.cmat", "rb") as f:
        kaldi.expect_binary(f)
        got = kaldi.read_value(f)
    np.testing.assert_allclose(got, cmat, atol=1e-6)


def test_dpcl_and_centroid(tmp_path, rng):
    sr = 16000
    s1 = (np.sin(2 * np.pi * 300 * np.arange(sr) / sr) * 0.3).astype(
        np.float32)
    s2 = (np.sin(2 * np.pi * 1500 * np.arange(sr) / sr) * 0.3).astype(
        np.float32)
    write_wav(tmp_path / "s1.wav", s1, sr=sr)
    write_wav(tmp_path / "s2.wav", s2, sr=sr)
    write_wav(tmp_path / "mix.wav", s1 + s2, sr=sr)
    (tmp_path / "mix.scp").write_text(f"u1 {tmp_path}/mix.wav\n")
    (tmp_path / "s1.scp").write_text(f"u1 {tmp_path}/s1.wav\n")
    (tmp_path / "s2.scp").write_text(f"u1 {tmp_path}/s2.wav\n")
    _run("compute_dpcl_label", [str(tmp_path / "mix.scp"),
                                f"{tmp_path}/s1.scp,{tmp_path}/s2.scp",
                                str(tmp_path / "labels")])
    labels = np.load(tmp_path / "labels" / "u1.npy")
    assert set(np.unique(labels)) <= {-1.0, 0.0, 1.0}
    # centroid over fake embeddings
    with NumpyWriter(str(tmp_path / "emb"), str(tmp_path / "emb.scp")) as w:
        for i in range(4):
            w.write(f"u{i}",
                    (np.full(8, i % 2, dtype=np.float32) +
                     rng.standard_normal(8).astype(np.float32) * 0.01))
    (tmp_path / "spk2utt").write_text("a u0 u2\nb u1 u3\n")
    _run("compute_centroid", [str(tmp_path / "emb.scp"),
                              str(tmp_path / "spk2utt"),
                              str(tmp_path / "cent"),
                              "--vector-type", "numpy"])
    cent_a = np.load(tmp_path / "cent" / "a.npy")
    assert abs(cent_a.mean() - 0.0) < 0.1


def test_online_beamformer_cli(tmp_path, rng):
    from setk_tpu.dsp import StftConfig, forward_stft
    sr = 16000
    cfg = StftConfig()
    clean = (rng.standard_normal(sr) * 0.2).astype(np.float32)
    wav = np.stack([clean] * 4) + \
        (rng.standard_normal((4, sr)) * 0.05).astype(np.float32)
    for c in range(4):
        write_wav(tmp_path / f"u.CH{c}.wav", wav[c], sr=sr)
    (tmp_path / "wav.scp").write_text(f"u {tmp_path}/u.CH*.wav\n")
    spec = np.asarray(forward_stft(wav[0], cfg))
    mask = (np.abs(spec) / (np.abs(spec) + 0.05)).astype(np.float32)
    np.save(tmp_path / "u.npy", mask)
    (tmp_path / "mask.scp").write_text(f"u {tmp_path}/u.npy\n")
    _run("apply_adaptive_beamformer", [
        str(tmp_path / "wav.scp"), str(tmp_path / "mask.scp"),
        str(tmp_path / "enh"), "--fmt", "numpy", "--beamformer", "mvdr",
        "--chunk-size", "32", "--alpha", "0.8"
    ])
    out = read_wav(tmp_path / "enh" / "u.wav")
    assert np.isfinite(out).all() and out.shape[-1] == sr


def test_extract_segments_and_archive_wav(tmp_path, rng):
    long_wav = (rng.standard_normal(32000) * 0.2).astype(np.float32)
    write_wav(tmp_path / "rec.wav", long_wav)
    (tmp_path / "wav.scp").write_text(f"rec {tmp_path}/rec.wav\n")
    (tmp_path / "segments").write_text("seg1 rec 0.5 1.0\nseg2 rec 1.2 1.5\n")
    _run("extract_segments", [str(tmp_path / "wav.scp"),
                              str(tmp_path / "segments"),
                              str(tmp_path / "segs")])
    seg1 = read_wav(tmp_path / "segs" / "seg1.wav")
    np.testing.assert_allclose(seg1, long_wav[8000:16000], atol=1e-3)
    _run("archive_wav", [str(tmp_path / "wav.scp"),
                         str(tmp_path / "wav.ark"),
                         str(tmp_path / "ark.scp")])
    from setk_tpu.io import WaveReader
    got = WaveReader(str(tmp_path / "ark.scp"))["rec"]
    np.testing.assert_allclose(got, long_wav, atol=1e-3)
