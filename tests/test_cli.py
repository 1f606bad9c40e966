"""End-to-end CLI tests: drive the command surface over a tiny corpus."""

import importlib
import json

import numpy as np
import pytest

from setk_tpu.io.wave import write_wav, read_wav
from setk_tpu.io import parse_scps
from setk_tpu.sim.rir import rir_generate_native
from setk_tpu.sim.mixer import simulate


def _cmd(name):
    return importlib.import_module(f"setk_tpu.cli.{name}")


def _parse(name, argv):
    return _cmd(name).make_parser().parse_args(argv)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    """Simulated 4-ch corpus: 2 utterances of clean+noise mixtures."""
    root = tmp_path_factory.mktemp("corpus")
    rng = np.random.default_rng(7)
    sr = 16000
    room = [5.0, 4.0, 3.0]
    mics = [[2.0 + 0.05 * i, 1.0, 1.5] for i in range(4)]
    entries = {"mix": [], "clean": [], "noise": []}
    for u in range(2):
        t = np.arange(sr) / sr
        clean = (np.sin(2 * np.pi * (220 + 100 * u + 200 * t) * t) *
                 0.3).astype(np.float32)
        noise = (rng.standard_normal(sr) * 0.8).astype(np.float32)
        rir_s = rir_generate_native(room, [3.5, 2.5, 1.6], mics, sr=sr,
                                    t60=0.15)
        rir_n = rir_generate_native(room, [1.0, 3.0, 1.4], mics, sr=sr,
                                    t60=0.15)
        mix, refs, nref = simulate([clean], src_rir=[rir_s],
                                   point_noise=[noise],
                                   point_noise_snr=[5.0],
                                   point_noise_rir=[rir_n],
                                   norm_factor=0.5)
        key = f"utt{u + 1}"
        for ch in range(4):
            write_wav(root / f"{key}.CH{ch}.wav", mix[ch], sr=sr)
        write_wav(root / f"{key}_clean.wav", refs[0], sr=sr)
        write_wav(root / f"{key}_noise.wav", nref, sr=sr)
        entries["mix"].append(f"{key} {root}/{key}.CH*.wav")
        entries["clean"].append(f"{key} {root}/{key}_clean.wav")
        entries["noise"].append(f"{key} {root}/{key}_noise.wav")
    (root / "mix.scp").write_text("\n".join(entries["mix"]) + "\n")
    (root / "mix0.scp").write_text("\n".join(
        e.replace("CH*", "CH0") for e in entries["mix"]) + "\n")
    (root / "clean.scp").write_text("\n".join(entries["clean"]) + "\n")
    (root / "noise.scp").write_text("\n".join(entries["noise"]) + "\n")
    return root


def _si_snr_np(x, s):
    n = min(len(x), len(s))
    x, s = x[:n] - x[:n].mean(), s[:n] - s[:n].mean()
    t = np.inner(x, s) * s / (np.linalg.norm(s)**2 + 1e-8)
    return 20 * np.log10(np.linalg.norm(t) / (np.linalg.norm(x - t) + 1e-8))


def test_compute_mask_and_separate(corpus, tmp_path):
    mask_ark = tmp_path / "irm.ark"
    mask_scp = tmp_path / "irm.scp"
    _cmd("compute_mask").run(_parse("compute_mask", [
        str(corpus / "clean.scp"), str(corpus / "mix0.scp"), str(mask_ark),
        "--scp", str(mask_scp), "--mask", "irm"
    ]))
    assert mask_ark.exists()
    sep_dir = tmp_path / "sep"
    _cmd("wav_separate").run(_parse("wav_separate", [
        str(corpus / "mix0.scp"), str(mask_scp), str(sep_dir),
        "--fmt", "kaldi"
    ]))
    clean = read_wav(str(corpus / "utt1_clean.wav"))
    mix = read_wav(str(corpus / "utt1.CH0.wav"))
    enh = read_wav(str(sep_dir / "utt1.wav"))
    assert _si_snr_np(enh, clean) > _si_snr_np(mix, clean) + 3


def test_adaptive_beamformer_cli(corpus, tmp_path):
    # oracle IRM masks from channel 0
    mask_dir = tmp_path / "masks"
    mask_dir.mkdir()
    import setk_tpu.dsp as dsp
    cfg = dsp.StftConfig()
    scp_lines = []
    for key in ("utt1", "utt2"):
        clean = read_wav(str(corpus / f"{key}_clean.wav"))
        mix = read_wav(str(corpus / f"{key}.CH0.wav"))
        s_c = np.asarray(dsp.forward_stft(clean, cfg))
        s_m = np.asarray(dsp.forward_stft(mix, cfg))
        irm = (np.abs(s_c) /
               (np.abs(s_c) + np.abs(s_m - s_c) + 1e-7)).astype(np.float32)
        np.save(mask_dir / f"{key}.npy", irm)
        scp_lines.append(f"{key} {mask_dir}/{key}.npy")
    (mask_dir / "mask.scp").write_text("\n".join(scp_lines) + "\n")
    enh_dir = tmp_path / "enh"
    _cmd("apply_adaptive_beamformer").run(
        _parse("apply_adaptive_beamformer", [
            str(corpus / "mix.scp"), str(mask_dir / "mask.scp"),
            str(enh_dir), "--beamformer", "mvdr", "--fmt", "numpy"
        ]))
    clean = read_wav(str(corpus / "utt1_clean.wav"))
    mix = read_wav(str(corpus / "utt1.CH0.wav"))
    enh = read_wav(str(enh_dir / "utt1.wav"))
    assert _si_snr_np(enh, clean) > _si_snr_np(mix, clean) + 3

    # batched executor path (prefetch loader + BatchEnhancer)
    enh_dir2 = tmp_path / "enh_batched"
    _cmd("apply_adaptive_beamformer").run(
        _parse("apply_adaptive_beamformer", [
            str(corpus / "mix.scp"), str(mask_dir / "mask.scp"),
            str(enh_dir2), "--beamformer", "mvdr", "--fmt", "numpy",
            "--batch-size", "2"
        ]))
    enh2 = read_wav(str(enh_dir2 / "utt1.wav"))
    assert _si_snr_np(enh2, clean) > _si_snr_np(mix, clean) + 3


def test_cgmm_pipeline_cli(corpus, tmp_path):
    mask_dir = tmp_path / "cgmm"
    _cmd("estimate_cgmm_masks").run(_parse("estimate_cgmm_masks", [
        str(corpus / "mix.scp"), str(mask_dir), "--scp",
        str(mask_dir / "mask.scp"), "--num-iters", "10"
    ]))
    masks = np.load(mask_dir / "utt1.npy")
    assert masks.ndim == 2  # T x F speech mask
    assert 0 <= masks.min() and masks.max() <= 1


def test_ssl_cli(corpus, tmp_path):
    sv_path = tmp_path / "sv.npy"
    _cmd("compute_steer_vector").run(_parse("compute_steer_vector", [
        str(sv_path), "--geometry", "linear",
        "--linear-topo", "0,0.05,0.1,0.15", "--num-doas", "181",
        "--num-bins", "257"
    ]))
    sv = np.load(sv_path)
    assert sv.shape == (181, 4, 257)
    doa_scp = tmp_path / "utt2doa"
    _cmd("do_ssl").run(_parse("do_ssl", [
        str(corpus / "mix.scp"), str(sv_path), str(doa_scp),
        "--backend", "srp", "--srp-pair", "0,3;1,2"
    ]))
    utt2doa = parse_scps(str(doa_scp))
    assert len(utt2doa) == 2
    for v in utt2doa.values():
        assert 0 <= float(v) <= 180


def test_feature_clis(corpus, tmp_path):
    _cmd("compute_spectrogram").run(_parse("compute_spectrogram", [
        str(corpus / "mix0.scp"), str(tmp_path / "spec.ark"),
        "--scp", str(tmp_path / "spec.scp")
    ]))
    _cmd("compute_fbank").run(_parse("compute_fbank", [
        str(corpus / "mix0.scp"), str(tmp_path / "fbank.ark"),
        "--scp", str(tmp_path / "fbank.scp"), "--num-bins", "40"
    ]))
    from setk_tpu.io import ScriptReader
    spec = ScriptReader(str(tmp_path / "spec.scp"))["utt1"]
    fbank = ScriptReader(str(tmp_path / "fbank.scp"))["utt1"]
    assert spec.shape[1] == 257
    assert fbank.shape[1] == 40
    _cmd("compute_ipd_and_linear_srp").run(
        _parse("compute_ipd_and_linear_srp", [
            str(corpus / "mix.scp"), str(tmp_path / "ipd.ark"),
            "--scp", str(tmp_path / "ipd.scp"), "--type", "ipd",
            "--ipd.pair", "0,1;0,3"
        ]))
    ipd_feat = ScriptReader(str(tmp_path / "ipd.scp"))["utt1"]
    assert ipd_feat.shape[1] == 2 * 257


def test_metric_clis(corpus, tmp_path, capsys):
    _cmd("compute_si_snr").run(_parse("compute_si_snr", [
        str(corpus / "mix0.scp"), str(corpus / "clean.scp")
    ]))
    out = capsys.readouterr().out
    assert "Si-SNR" in out
    _cmd("wav_duration").run(_parse("wav_duration", [
        str(corpus / "mix0.scp"), str(tmp_path / "utt2dur")
    ]))
    utt2dur = parse_scps(str(tmp_path / "utt2dur"))
    assert abs(float(utt2dur["utt1"]) - 1.0) < 0.01


def test_wav_simulate_cli(corpus, tmp_path):
    _cmd("wav_simulate").run(_parse("wav_simulate", [
        str(tmp_path / "simu.wav"),
        "--src-spk", str(corpus / "utt1_clean.wav"),
        "--point-noise", str(corpus / "utt1_noise.wav"),
        "--point-noise-snr", "10",
        "--dump-ref-dir", str(tmp_path / "ref"),
    ]))
    mix = read_wav(str(tmp_path / "simu.wav"))
    assert abs(np.abs(mix).max() - 0.9) < 2e-3
    assert (tmp_path / "ref" / "clean" / "simu.wav").exists()


def test_rir_generate_cli(tmp_path):
    _cmd("rir_generate_1d").run(_parse("rir_generate_1d", [
        "--dump-dir", str(tmp_path / "rirs"), "--num-rooms", "1",
        "--num-rirs", "1", "--rir-dur", "0.15", "--room-dim",
        "4,5;4,5;2.5,3", "--rt60", "0.2,0.3", "--seed", "11"
    ]))
    cfg = json.loads((tmp_path / "rirs" / "rir.json").read_text())
    assert len(cfg) == 1


def test_dispatcher_lists_commands():
    from setk_tpu.cli.__main__ import available_commands
    cmds = available_commands()
    for expected in ("compute_mask", "apply_adaptive_beamformer", "do_ssl",
                     "wav_simulate", "apply_wpe", "estimate_cacgmm_masks"):
        assert expected in cmds
    assert len(cmds) >= 35
