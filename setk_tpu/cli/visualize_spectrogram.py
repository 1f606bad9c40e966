#!/usr/bin/env python
"""Visualize (log) spectrograms straight from wave scripts.

Parity: /root/reference/scripts/sptk/visualize_spectrogram.py.
"""

import argparse
from pathlib import Path

import numpy as np

from setk_tpu.cli.common import StftParser, stft_config_from_args
from setk_tpu.io import SpectrogramReader
from setk_tpu.cli.visualize_tf_matrix import save_figure
from setk_tpu.utils import get_logger

logger = get_logger(__name__)


def run(args):
    cfg = stft_config_from_args(args)
    reader = SpectrogramReader(args.wav_scp, cfg=cfg, apply_abs=True,
                               apply_log=True)
    cache_dir = Path(args.cache_dir)
    cache_dir.mkdir(exist_ok=True, parents=True)
    for key, spec in reader:
        if spec.ndim == 3:
            spec = spec[0]
        save_figure(key, np.asarray(spec), cache_dir / f"{key}.png",
                    cmap=args.cmap, hop=cfg.frame_hop, sr=args.sr)


def make_parser():
    parser = argparse.ArgumentParser(
        description="Visualize log spectrograms of utterances",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
        parents=[StftParser.parser])
    parser.add_argument("wav_scp", help="Input wave scripts")
    parser.add_argument("--cache-dir", default="figures")
    parser.add_argument("--cmap", default="jet")
    parser.add_argument("--sr", type=int, default=16000)
    return parser


if __name__ == "__main__":
    run(make_parser().parse_args())
