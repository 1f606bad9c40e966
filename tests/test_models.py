"""Neural mask estimator tests: training decreases loss, e2e CLI round."""

import numpy as np
import pytest

from setk_tpu.models.mask_net import make_model, quadratic_loss
from setk_tpu.models.trainer import (MaskTrainer, save_checkpoint,
                                     load_checkpoint)
from setk_tpu.parallel import make_mesh


@pytest.mark.parametrize("arch", ["dnn", "tdnn", "cnn-tdnn", "lstm", "blstm"])
def test_masknet_forward_shapes(rng, arch):
    model = make_model(arch=arch, num_bins=33, hidden=32, num_layers=2)
    import jax
    params = model.init(jax.random.PRNGKey(0), np.zeros((2, 16, 33)))
    out = model.apply(params, np.asarray(
        rng.standard_normal((2, 16, 33)), dtype=np.float32))
    out = np.asarray(out)
    assert out.shape == (2, 16, 33)
    assert (out >= 0).all() and (out <= 1).all()


def _toy_batch(rng, b=4, t=32, f=33):
    # learnable mapping: mask = 1 where feature > 0
    feats = rng.standard_normal((b, t, f)).astype(np.float32)
    targets = (feats > 0).astype(np.float32)
    fmask = np.ones((b, t), dtype=np.float32)
    return feats, targets, fmask


def test_training_decreases_loss(rng):
    model = make_model(arch="dnn", num_bins=33, hidden=64, num_layers=2)
    trainer = MaskTrainer(model, lr=3e-3)
    batch = _toy_batch(rng)
    losses = [trainer.train_batch(*batch) for _ in range(60)]
    assert losses[-1] < 0.5 * losses[0]


def test_data_parallel_step_runs(rng):
    mesh = make_mesh(8, axis_sizes=(8, 1, 1))
    model = make_model(arch="dnn", num_bins=33, hidden=32, num_layers=1)
    trainer = MaskTrainer(model, lr=1e-3, mesh=mesh)
    loss = trainer.train_batch(*_toy_batch(rng, b=8))
    assert np.isfinite(loss)


def test_checkpoint_roundtrip(tmp_path, rng):
    model = make_model(arch="dnn", num_bins=33, hidden=32, num_layers=1)
    trainer = MaskTrainer(model, lr=1e-3)
    trainer.train_batch(*_toy_batch(rng))
    meta = {"arch": "dnn", "num_bins": 33, "hidden": 32, "num_layers": 1,
            "frame_len": 64, "frame_hop": 32, "window": "hann",
            "center": True, "round_power_of_two": True}
    ckpt = tmp_path / "mdl.msgpack"
    save_checkpoint(ckpt, trainer.params, meta)
    model2, params2, meta2 = load_checkpoint(ckpt)
    feats, _, _ = _toy_batch(rng)
    out1 = np.asarray(trainer.predict(feats))
    out2 = np.asarray(model2.apply({"params": params2}, feats))
    np.testing.assert_allclose(out1, out2, atol=1e-6)


def test_train_cli_end_to_end(tmp_path, rng):
    """Tiny corpus: train 2 epochs, run inference, check mask sanity."""
    import importlib
    from setk_tpu.io.wave import write_wav
    from setk_tpu.dsp import StftConfig, forward_stft
    sr = 16000
    cfg = StftConfig(frame_len=256, frame_hop=128)
    scp, mask_scp_lines = [], []
    mask_dir = tmp_path / "masks"
    mask_dir.mkdir()
    for u in range(3):
        t = np.arange(sr // 2) / sr
        clean = (np.sin(2 * np.pi * (300 + 50 * u) * t) * 0.3).astype(
            np.float32)
        noise = (rng.standard_normal(sr // 2) * 0.1).astype(np.float32)
        write_wav(tmp_path / f"u{u}.wav", clean + noise, sr=sr)
        s_c = np.asarray(forward_stft(clean, cfg))
        s_m = np.asarray(forward_stft(clean + noise, cfg))
        irm = (np.abs(s_c) /
               (np.abs(s_c) + np.abs(s_m - s_c) + 1e-7)).astype(np.float32)
        np.save(mask_dir / f"u{u}.npy", irm)
        scp.append(f"u{u} {tmp_path}/u{u}.wav")
        mask_scp_lines.append(f"u{u} {mask_dir}/u{u}.npy")
    (tmp_path / "wav.scp").write_text("\n".join(scp) + "\n")
    (tmp_path / "mask.scp").write_text("\n".join(mask_scp_lines) + "\n")

    train = importlib.import_module("setk_tpu.cli.train_mask_estimator")
    args = train.make_parser().parse_args([
        str(tmp_path / "wav.scp"), str(tmp_path / "mask.scp"),
        str(tmp_path / "mdl.msgpack"), "--fmt", "numpy", "--arch", "dnn",
        "--hidden", "64", "--num-layers", "1", "--epochs", "3",
        "--frame-len", "256", "--frame-hop", "128",
        "--frames-per-utt", "64",
    ])
    train.run(args)
    infer = importlib.import_module("setk_tpu.cli.estimate_nn_masks")
    iargs = infer.make_parser().parse_args([
        str(tmp_path / "wav.scp"), str(tmp_path / "mdl.msgpack"),
        str(tmp_path / "nn_masks")
    ])
    infer.run(iargs)
    mask = np.load(tmp_path / "nn_masks" / "u0.npy")
    spec = np.asarray(
        forward_stft(np.zeros(sr // 2, dtype=np.float32), cfg))
    assert mask.shape == spec.shape
    assert (mask >= 0).all() and (mask <= 1).all()
