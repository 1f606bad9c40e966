"""Second CLI batch: classic/fixed beamformers, auxiva, ns, vad,
wav_estimate, format transforms, feat utils, rir_simulate, EM resume."""

import importlib

import numpy as np
import pytest

from setk_tpu.io.wave import write_wav, read_wav
from setk_tpu.io import parse_scps, ScriptReader, ArchiveWriter
from setk_tpu.spatial.steer import linear_steer_vector


def _cmd(name):
    return importlib.import_module(f"setk_tpu.cli.{name}")


def _run(name, argv):
    mod = _cmd(name)
    mod.run(mod.make_parser().parse_args(argv))


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("corpus2")
    rng = np.random.default_rng(3)
    sr = 16000
    topo = [0.0, 0.05, 0.1, 0.15]
    sv = linear_steer_vector(topo, 70.0, 257)  # F x N (time delays)
    t = np.arange(sr) / sr
    src = (np.sin(2 * np.pi * 400 * t) * 0.3).astype(np.float32)
    # build a steered multichannel signal in the STFT domain
    from setk_tpu.dsp import StftConfig, forward_stft, inverse_stft
    cfg = StftConfig()
    spec = np.asarray(forward_stft(src, cfg))  # T x F
    multi_spec = sv.T[:, None, :] * spec[None]  # N x T x F
    wav = np.asarray(inverse_stft(multi_spec, cfg, nsamps=sr))
    wav = wav + rng.standard_normal(wav.shape).astype(np.float32) * 0.01
    for c in range(4):
        write_wav(root / f"utt.CH{c}.wav", wav[c], sr=sr)
    write_wav(root / "mono.wav", wav[0], sr=sr)
    (root / "wav.scp").write_text(f"utt {root}/utt.CH*.wav\n")
    (root / "mono.scp").write_text(f"utt {root}/mono.wav\n")
    return root


def test_classic_ds_sd(corpus, tmp_path):
    for bf in ("ds", "sd"):
        out = tmp_path / bf
        _run(f"apply_{bf}_beamformer", [
            str(corpus / "wav.scp"), str(out), "--geometry", "linear",
            "--linear-topo", "0,0.05,0.1,0.15", "--doa", "70"
        ])
        enh = read_wav(out / "utt.wav")
        assert enh.ndim == 1 and np.isfinite(enh).all()


def test_fixed_beamformer(corpus, tmp_path):
    w = (linear_steer_vector([0, 0.05, 0.1, 0.15], 70.0, 257) / 4)
    np.save(tmp_path / "w.npy", w.astype(np.complex64))
    _run("apply_fixed_beamformer", [
        str(corpus / "wav.scp"), str(tmp_path / "w.npy"),
        str(tmp_path / "fixed")
    ])
    assert (tmp_path / "fixed" / "utt.wav").exists()


def test_auxiva_cli(corpus, tmp_path):
    _run("apply_auxiva", [
        str(corpus / "wav.scp"), str(tmp_path / "iva"), "--epochs", "3"
    ])
    assert (tmp_path / "iva" / "utt.src1.wav").exists()
    assert (tmp_path / "iva" / "utt.src4.wav").exists()


def test_ns_cli(corpus, tmp_path):
    _run("apply_ns", [
        str(corpus / "mono.scp"), str(tmp_path / "ns"),
        "--estimator", "imcra"
    ])
    out = read_wav(tmp_path / "ns" / "utt.wav")
    assert np.isfinite(out).all()
    _run("apply_ns", [
        str(corpus / "mono.scp"), str(tmp_path / "gain"),
        "--output", "gain"
    ])
    gain = np.load(tmp_path / "gain" / "utt.npy")
    assert (gain >= 0).all() and (gain <= 1 + 1e-4).all()


def test_vad_cli(corpus, tmp_path):
    # bursts between silences (a constant-energy tone has no noise floor
    # for the adaptive VAD to reference)
    rng = np.random.default_rng(0)
    sr = 16000
    sil = (rng.standard_normal(sr) * 0.001).astype(np.float32)
    speech = (rng.standard_normal(sr) * 0.5).astype(np.float32)
    write_wav(tmp_path / "burst.wav", np.concatenate([sil, speech, sil]),
              sr=sr)
    (tmp_path / "burst.scp").write_text(f"utt {tmp_path}/burst.wav\n")
    _run("do_vad", [str(tmp_path / "burst.scp"), str(tmp_path / "vad")])
    out = read_wav(tmp_path / "vad" / "utt.wav")
    assert 0.5 * sr < out.shape[-1] < 2 * sr


def test_wav_estimate_griffin_lim(corpus, tmp_path):
    _run("compute_spectrogram", [
        str(corpus / "mono.scp"), str(tmp_path / "mag.ark"),
        "--scp", str(tmp_path / "mag.scp"), "--apply-log", "false"
    ])
    _run("wav_estimate", [
        str(tmp_path / "mag.scp"), str(tmp_path / "gl"),
        "--gl-epochs", "8"
    ])
    out = read_wav(tmp_path / "gl" / "utt.wav")
    assert np.isfinite(out).all()


def test_copy_transforms(tmp_path, rng):
    mats = {f"m{i}": rng.standard_normal((5, 7)).astype(np.float32)
            for i in range(3)}
    npy_dir = tmp_path / "npy"
    npy_dir.mkdir()
    lines = []
    for k, v in mats.items():
        np.save(npy_dir / f"{k}.npy", v)
        lines.append(f"{k} {npy_dir}/{k}.npy")
    (tmp_path / "npy.scp").write_text("\n".join(lines) + "\n")
    _run("copy_mat_to_archive", [
        str(tmp_path / "npy.scp"), str(tmp_path / "out.ark"),
        "--scp", str(tmp_path / "out.scp"), "--src-format", "npy",
        "--op", "trans"
    ])
    reader = ScriptReader(str(tmp_path / "out.scp"))
    np.testing.assert_allclose(reader["m1"], mats["m1"].T, atol=1e-6)
    _run("copy_archive_to_mat", [
        str(tmp_path / "out.scp"), str(tmp_path / "back"),
        "--dst-format", "npy"
    ])
    back = np.load(tmp_path / "back" / "m2.npy")
    np.testing.assert_allclose(back, mats["m2"].T, atol=1e-6)


def test_feat_utils(tmp_path, rng, corpus):
    feats = rng.standard_normal((20, 10)).astype(np.float32) * 3 + 1
    with ArchiveWriter(str(tmp_path / "f.ark"), str(tmp_path / "f.scp")) as w:
        w.write("u1", feats)
    _run("feat_utils", [
        "cmvn", str(tmp_path / "f.scp"), str(tmp_path / "cmvn.ark"),
        "--scp", str(tmp_path / "cmvn.scp"), "--norm-vars", "true"
    ])
    out = ScriptReader(str(tmp_path / "cmvn.scp"))["u1"]
    assert abs(out.mean()) < 1e-5 and abs(out.std() - 1) < 1e-2
    _run("feat_utils", [
        "wav-to-power", str(corpus / "mono.scp"),
        str(tmp_path / "utt2power")
    ])
    assert "utt" in parse_scps(str(tmp_path / "utt2power"))


def test_rir_simulate_cli(tmp_path):
    _run("rir_simulate", [
        str(tmp_path / "rir.wav"), "--room-topo", "5,4,3",
        "--source-location", "2,3,1.5",
        "--receiver-location", "2,1.5,1;2.05,1.5,1",
        "--beta", "0.25"
    ])
    rir = read_wav(tmp_path / "rir.wav", normalize=True)
    assert rir.shape == (2, 4000)


def test_cgmm_resume_model(corpus, tmp_path):
    # 5 iters + resume 5 ~ straight 10 (same trajectory modulo fp)
    _run("estimate_cgmm_masks", [
        str(corpus / "wav.scp"), str(tmp_path / "m5"),
        "--num-iters", "5", "--dump-model", str(tmp_path / "mdl")
    ])
    _run("estimate_cgmm_masks", [
        str(corpus / "wav.scp"), str(tmp_path / "m10r"),
        "--num-iters", "5", "--resume-model", str(tmp_path / "mdl")
    ])
    _run("estimate_cgmm_masks", [
        str(corpus / "wav.scp"), str(tmp_path / "m10"),
        "--num-iters", "10"
    ])
    resumed = np.load(tmp_path / "m10r" / "utt.npy")
    straight = np.load(tmp_path / "m10" / "utt.npy")
    # posterior agreement on the vast majority of bins
    agree = np.mean(np.abs(resumed - straight) < 0.1)
    assert agree > 0.95, agree


def test_cacgmm_init_mask(corpus, tmp_path):
    """--init-mask seeds the CACGMM EM (reference parity:
    estimate_cacgmm_masks.py --init-mask / --mask-format)."""
    # first pass makes a mask we can reuse as the seed
    _run("estimate_cacgmm_masks", [
        str(corpus / "wav.scp"), str(tmp_path / "m0"),
        "--num-iters", "4", "--solve-permu", "false"
    ])
    seed_dir = tmp_path / "seed"
    seed_dir.mkdir()
    m0 = np.load(tmp_path / "m0" / "utt.npy")  # K x T x F
    np.save(seed_dir / "utt.npy", m0.astype(np.float32))
    _run("estimate_cacgmm_masks", [
        str(corpus / "wav.scp"), str(tmp_path / "m1"),
        "--num-iters", "2", "--solve-permu", "false",
        "--init-mask", str(seed_dir), "--mask-format", "numpy"
    ])
    m1 = np.load(tmp_path / "m1" / "utt.npy")
    assert m1.shape == m0.shape
    assert np.isfinite(m1).all()
    # seeded run should broadly agree with its seed's class assignment
    agree = np.mean((m1[0] > 0.5) == (m0[0] > 0.5))
    assert agree > 0.7, agree


def test_reference_flag_aliases():
    """The reference CLIs' exact flag spellings parse as aliases."""
    from setk_tpu.cli.apply_adaptive_beamformer import make_parser as bf
    a = bf().parse_args(["w.scp", "m.scp", "out", "--post-masking", "true",
                         "--online.alpha", "0.7", "--online.chunk-size",
                         "64", "--online.channels", "4",
                         "--mask-format", "kaldi"])
    assert a.mask and a.alpha == 0.7 and a.chunk_size == 64
    assert a.fmt == "kaldi"
    from setk_tpu.cli.apply_wpe import make_parser as wp
    w = wp().parse_args(["w.scp", "out", "--sample-rate", "8000",
                         "--nara-wpe", "true"])
    assert w.sr == 8000 and w.nara_wpe
    from setk_tpu.cli.wav_separate import make_parser as sep
    sp = sep().parse_args(["w.scp", "m.scp", "out",
                           "--use-mixed-norm", "false"])
    assert not sp.mixed_norm
