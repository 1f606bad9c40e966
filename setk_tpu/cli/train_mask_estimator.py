#!/usr/bin/env python
"""Train a neural T-F mask estimator (DNN/TDNN/LSTM/BLSTM).

TPU-native replacement for the reference's Kaldi-nnet3 recipes
(/root/reference/steps/train_dnn_mask.sh, train_rnn_mask.sh): features
are log-magnitude spectrograms, targets oracle masks (compute_mask),
objective the quadratic loss, batches padded per bucket and data-parallel
over the device mesh.
"""

import argparse

import numpy as np

from setk_tpu.cli.common import StftParser, stft_config_from_args
from setk_tpu.dsp.stft import num_frames
from setk_tpu.io import SpectrogramReader, MaskReader
from setk_tpu.models.mask_net import make_model
from setk_tpu.models.trainer import MaskTrainer, save_checkpoint
from setk_tpu.utils import get_logger

logger = get_logger(__name__)


def _batches(reader, mask_reader, keys, cfg, batch_size, t_bucket=256):
    feats, targets, masks = [], [], []
    for key in keys:
        if key not in mask_reader:
            continue
        spec = reader[key]  # T x F (mono) log-magnitude
        if spec.ndim == 3:
            spec = spec[0]
        target = np.asarray(mask_reader[key])
        if target.shape != spec.shape:
            target = target.T
        t = min(spec.shape[0], t_bucket)
        f = spec.shape[1]
        feat = np.zeros((t_bucket, f), dtype=np.float32)
        tgt = np.zeros((t_bucket, f), dtype=np.float32)
        fm = np.zeros((t_bucket,), dtype=np.float32)
        feat[:t] = spec[:t]
        tgt[:t] = np.clip(target[:t], 0, 1)
        fm[:t] = 1.0
        feats.append(feat)
        targets.append(tgt)
        masks.append(fm)
        if len(feats) == batch_size:
            yield (np.stack(feats), np.stack(targets), np.stack(masks))
            feats, targets, masks = [], [], []
    if feats:
        yield (np.stack(feats), np.stack(targets), np.stack(masks))


def run(args):
    cfg = stft_config_from_args(args)
    reader = SpectrogramReader(args.wav_scp, cfg=cfg, apply_abs=True,
                               apply_log=True)
    mask_reader = MaskReader(args.fmt, args.mask_scp)
    model = make_model(arch=args.arch, num_bins=cfg.num_bins,
                       hidden=args.hidden, num_layers=args.num_layers)
    mesh = None
    if args.data_parallel:
        import jax
        from setk_tpu.parallel import make_mesh
        n = len(jax.devices())
        if n > 1:
            mesh = make_mesh(n, axis_sizes=(n, 1, 1))
            logger.info(f"Data-parallel training over {n} devices")
    trainer = MaskTrainer(model, lr=args.lr, mesh=mesh, seed=args.seed)
    keys = list(reader.keys())
    rng = np.random.default_rng(args.seed)
    for epoch in range(args.epochs):
        rng.shuffle(keys)
        losses = []
        for feats, targets, fmask in _batches(reader, mask_reader, keys,
                                              cfg, args.batch_size,
                                              args.frames_per_utt):
            if mesh is not None:
                mult = mesh.shape["data"]
                pad = -feats.shape[0] % mult
                if pad:
                    feats = np.pad(feats, ((0, pad), (0, 0), (0, 0)))
                    targets = np.pad(targets, ((0, pad), (0, 0), (0, 0)))
                    fmask = np.pad(fmask, ((0, pad), (0, 0)))
            losses.append(trainer.train_batch(feats, targets, fmask))
        logger.info(f"Epoch {epoch + 1}/{args.epochs}: "
                    f"loss = {np.mean(losses):.5f} "
                    f"({len(losses)} batches)")
    save_checkpoint(args.checkpoint, trainer.params, {
        "arch": args.arch,
        "num_bins": cfg.num_bins,
        "hidden": args.hidden,
        "num_layers": args.num_layers,
        "frame_len": cfg.frame_len,
        "frame_hop": cfg.frame_hop,
        "window": cfg.window,
        "center": cfg.center,
        "round_power_of_two": cfg.round_power_of_two,
    })


def make_parser():
    parser = argparse.ArgumentParser(
        description="Train a neural T-F mask estimator",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
        parents=[StftParser.parser])
    parser.add_argument("wav_scp", help="Noisy (mono) wave scripts")
    parser.add_argument("mask_scp", help="Target mask scripts")
    parser.add_argument("checkpoint", help="Output checkpoint path")
    parser.add_argument("--fmt", default="kaldi",
                        choices=["kaldi", "numpy", "exraw"])
    parser.add_argument("--arch", default="dnn",
                        choices=["dnn", "tdnn", "cnn-tdnn", "lstm", "blstm"])
    parser.add_argument("--hidden", type=int, default=512)
    parser.add_argument("--num-layers", type=int, default=3)
    parser.add_argument("--epochs", type=int, default=10)
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument("--frames-per-utt", type=int, default=256)
    parser.add_argument("--lr", type=float, default=1e-3)
    parser.add_argument("--data-parallel", action="store_true")
    parser.add_argument("--seed", type=int, default=0)
    return parser


if __name__ == "__main__":
    run(make_parser().parse_args())
