#!/usr/bin/env python
"""Deep-clustering training labels (-1 silence / argmax speaker).

Parity: /root/reference/scripts/sptk/compute_dpcl_label.py.
"""

import argparse

import numpy as np

from setk_tpu.cli.common import StftParser, stft_config_from_args
from setk_tpu.io import SpectrogramReader, NumpyWriter
from setk_tpu.utils import get_logger, EPSILON

logger = get_logger(__name__)


def _run(args):
    cfg = stft_config_from_args(args)
    spk_scps = args.spks.split(",")
    if len(spk_scps) < 2:
        raise RuntimeError("Please give at least 2 speakers")
    mix_reader = SpectrogramReader(args.mix, cfg=cfg, apply_abs=True)
    spk_readers = [SpectrogramReader(s, cfg=cfg, apply_abs=True)
                   for s in spk_scps]
    with NumpyWriter(args.dir) as writer:
        for key, mix in mix_reader:
            t, f = mix.shape
            masks = np.zeros_like(mix, dtype=np.float32)
            mix_db = 20 * np.log10(np.maximum(mix, EPSILON))
            sil = mix_db < (np.max(mix_db) - args.beta)
            masks[sil] = -1
            logger.info(f"For {key}, silence covered "
                        f"{np.sum(sil) * 100 / (t * f):.2f}%")
            labels = np.argmax(
                np.stack([r[key] for r in spk_readers]), axis=0)
            masks[~sil] = labels[~sil]
            writer.write(key, masks)
    logger.info(f"Processed {len(mix_reader)} utterances")


def run(args):
    from setk_tpu.utils.hostdev import on_host
    # eager utterance-loop command: pin compute to host CPU
    with on_host():
        _run(args)


def make_parser():
    parser = argparse.ArgumentParser(
        description="Compute labels for deep clustering "
        "(-1 silence, 0..N speakers)",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
        parents=[StftParser.parser])
    parser.add_argument("mix", help="Mixture wave scripts")
    parser.add_argument("spks", help="Per-speaker scps (comma-separated)")
    parser.add_argument("dir", help="Output directory")
    parser.add_argument("--beta", type=float, default=40,
                        help="Silence threshold (dB below max)")
    return parser


if __name__ == "__main__":
    run(make_parser().parse_args())
