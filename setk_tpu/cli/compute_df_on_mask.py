#!/usr/bin/env python
"""Directional features from mask-estimated steer vectors.

Parity: /root/reference/scripts/sptk/compute_df_on_mask.py
(mask -> covariance -> principal eigenvector -> DF).
"""

import argparse

import numpy as np

from setk_tpu.cli.common import StftParser, stft_config_from_args
from setk_tpu.enhance.beamformer import compute_covar
from setk_tpu.ops.linalg import solve_pevd
from setk_tpu.spatial.features import directional_feats
from setk_tpu.io import SpectrogramReader, MaskReader, ArchiveWriter
from setk_tpu.utils import get_logger

logger = get_logger(__name__)


def _run(args):
    cfg = stft_config_from_args(args)
    reader = SpectrogramReader(args.wav_scp, cfg=cfg, transpose=False)
    mask_reader = MaskReader(args.fmt, args.mask_scp)
    df_pair = [tuple(map(int, p.split(","))) for p in args.df_pair.split(";")]
    logger.info(f"Compute directional features with {df_pair}")
    num_done = 0
    with ArchiveWriter(args.dup_ark, args.scp) as writer:
        for key, obs in reader:
            if key not in mask_reader:
                logger.warning(f"Missing TF-mask for utterance {key}")
                continue
            mask = np.asarray(mask_reader[key])
            _, f_bins, _ = obs.shape
            if mask.shape[0] == f_bins:
                mask = mask.T
            mask = np.minimum(mask, 1)
            # obs: N x F x T -> covariance over the canonical F x N x T
            covar = np.asarray(
                compute_covar(obs.transpose(1, 0, 2).astype(np.complex64),
                              np.ascontiguousarray(mask.T)))
            sv = np.asarray(solve_pevd(covar))  # F x N
            df = np.asarray(directional_feats(obs, sv.T, df_pair=df_pair))
            writer.write(key, df.astype(np.float32))
            num_done += 1
            if num_done % 1000 == 0:
                logger.info(f"Processed {num_done} utterances...")
    logger.info(f"Processed {num_done} utterances over {len(reader)}")


def run(args):
    from setk_tpu.utils.hostdev import on_host
    # eager utterance-loop command: pin compute to host CPU
    with on_host():
        _run(args)


def make_parser():
    parser = argparse.ArgumentParser(
        description="Directional features from mask-estimated steer vectors",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
        parents=[StftParser.parser])
    parser.add_argument("wav_scp", help="Multi-channel wave scripts")
    parser.add_argument("mask_scp", help="T-F mask scripts")
    parser.add_argument("dup_ark", help="Output archive")
    parser.add_argument("--scp", default="")
    parser.add_argument("--fmt", default="kaldi",
                        choices=["kaldi", "numpy", "exraw"])
    parser.add_argument("--df-pair", default="0,1", help="Mic pairs")
    return parser


if __name__ == "__main__":
    run(make_parser().parse_args())
