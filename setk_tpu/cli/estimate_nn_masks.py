#!/usr/bin/env python
"""Estimate T-F masks with a trained neural estimator.

The nnet3 compute_output + mono_mask_enhance front half
(/root/reference/steps/mono_mask_enhance.sh:38-40) as one native
command: checkpoint -> per-utterance masks (.npy) ready for
wav_separate / apply_adaptive_beamformer.
"""

import argparse

import numpy as np

from setk_tpu.io import SpectrogramReader, NumpyWriter
from setk_tpu.dsp.stft import StftConfig
from setk_tpu.models.trainer import load_checkpoint
from setk_tpu.utils import get_logger

logger = get_logger(__name__)


def run(args):
    model, params, meta = load_checkpoint(args.checkpoint)
    cfg = StftConfig(frame_len=meta["frame_len"],
                     frame_hop=meta["frame_hop"],
                     window=meta["window"],
                     center=meta["center"],
                     round_power_of_two=meta["round_power_of_two"])
    reader = SpectrogramReader(args.wav_scp, cfg=cfg, apply_abs=True,
                               apply_log=True)
    import jax

    @jax.jit
    def infer(feats):
        return model.apply({"params": params}, feats)

    from setk_tpu.cli.common import pad_to_bucket
    num_done = 0
    with NumpyWriter(args.dst_dir, args.scp) as writer:
        for key, spec in reader:
            if spec.ndim == 3:
                spec = spec[0]
            feats, t_orig = pad_to_bucket(
                spec.astype(np.float32)[None], axis=1, bucket=64)
            mask = np.asarray(infer(feats))[0, :t_orig]
            writer.write(key, mask.astype(np.float32))
            num_done += 1
    logger.info(f"Processed {num_done} utterances")


def make_parser():
    parser = argparse.ArgumentParser(
        description="Run a trained neural mask estimator",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    parser.add_argument("wav_scp", help="Input (mono) wave scripts")
    parser.add_argument("checkpoint", help="Trained checkpoint path")
    parser.add_argument("dst_dir", help="Output directory (.npy masks)")
    parser.add_argument("--scp", default="")
    return parser


if __name__ == "__main__":
    run(make_parser().parse_args())
