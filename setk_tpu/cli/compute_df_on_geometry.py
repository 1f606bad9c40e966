#!/usr/bin/env python
"""Directional features from geometry steer vectors (+ utt2idx DoAs).

Parity: /root/reference/scripts/sptk/compute_df_on_geometry.py.
"""

import argparse

import numpy as np

from setk_tpu.cli.common import StftParser, stft_config_from_args
from setk_tpu.spatial.features import directional_feats
from setk_tpu.io import SpectrogramReader, ArchiveWriter, ScpReader
from setk_tpu.utils import get_logger

logger = get_logger(__name__)


def _run(args):
    cfg = stft_config_from_args(args)
    reader = SpectrogramReader(args.wav_scp, cfg=cfg, transpose=False)
    utt2idx = ScpReader(args.utt2idx, value_processor=int) \
        if args.utt2idx else None
    df_pair = [tuple(map(int, p.split(","))) for p in args.df_pair.split(";")]
    logger.info(f"Compute directional features with {df_pair}")
    steer_vector = np.load(args.steer_vector)  # A x M x F
    num_done = 0
    with ArchiveWriter(args.dup_ark, args.scp) as writer:
        for key, stft in reader:
            if utt2idx is None:
                idx = [int(v) for v in args.doa_idx.split(",")]
                dfs = [
                    np.asarray(
                        directional_feats(stft, steer_vector[i],
                                          df_pair=df_pair)) for i in idx
                ]
                df = dfs[0] if len(dfs) == 1 else np.stack(dfs).transpose(
                    1, 0, 2).reshape(dfs[0].shape[0], -1)
            elif key in utt2idx:
                df = np.asarray(
                    directional_feats(stft, steer_vector[utt2idx[key]],
                                      df_pair=df_pair))
            else:
                logger.warning(f"Missing utt2idx for utterance {key}")
                continue
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
        description="Directional features from geometry steer vectors",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
        parents=[StftParser.parser])
    parser.add_argument("wav_scp", help="Multi-channel wave scripts")
    parser.add_argument("steer_vector", help=".npy steering grid A x M x F")
    parser.add_argument("dup_ark", help="Output archive")
    parser.add_argument("--scp", default="")
    parser.add_argument("--utt2idx", default="",
                        help="Per-utterance DoA index script")
    parser.add_argument("--doa-idx", default="0",
                        help="Fixed DoA indices (comma-separated)")
    parser.add_argument("--df-pair", default="0,1", help="Mic pairs")
    return parser


if __name__ == "__main__":
    run(make_parser().parse_args())
