#!/usr/bin/env python
"""Linear/log (magnitude/power) spectrogram features -> archives.

Parity: /root/reference/scripts/sptk/compute_spectrogram.py.
"""

import argparse

import numpy as np

from setk_tpu.cli.common import StftParser, stft_config_from_args, strtobool
from setk_tpu.io import SpectrogramReader, ArchiveWriter, ExrawWriter
from setk_tpu.utils import get_logger

logger = get_logger(__name__)


def _run(args):
    cfg = stft_config_from_args(args)
    reader = SpectrogramReader(args.wav_scp, cfg=cfg,
                               apply_abs=True, apply_log=args.apply_log,
                               apply_pow=args.apply_pow)
    writer_cls = {"kaldi": ArchiveWriter, "exraw": ExrawWriter}[args.format]
    with writer_cls(args.dup_ark, args.scp) as writer:
        for key, feats in reader:
            writer.write(key,
                         np.asarray(feats[0] if feats.ndim == 3 else feats,
                                    dtype=np.float32))
    logger.info(f"Processed {len(reader)} utterances")


def run(args):
    from setk_tpu.utils.hostdev import on_host
    # eager utterance-loop command: pin compute to host CPU
    with on_host():
        _run(args)


def make_parser():
    parser = argparse.ArgumentParser(
        description="Extract spectrogram features into archives",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
        parents=[StftParser.parser])
    parser.add_argument("wav_scp", help="Input wave scripts")
    parser.add_argument("dup_ark", help="Output archive")
    parser.add_argument("--scp", default="")
    parser.add_argument("--format", default="kaldi",
                        choices=["kaldi", "exraw"])
    parser.add_argument("--apply-log", type=strtobool, default=True)
    parser.add_argument("--apply-pow", type=strtobool, default=False)
    return parser


if __name__ == "__main__":
    run(make_parser().parse_args())
