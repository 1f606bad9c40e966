#!/usr/bin/env python
"""Compute oracle T-F masks (irm/ibm/iam/psm/psa/crm) as training targets.

Parity: /root/reference/scripts/sptk/compute_mask.py (same flags; masks
computed by the jitted setk_tpu.enhance.masks kernel with clip logging).
"""

import argparse

import numpy as np

from setk_tpu.cli.common import StftParser, stft_config_from_args
from setk_tpu.enhance.masks import compute_mask, MASK_TYPES
from setk_tpu.io import SpectrogramReader, ArchiveWriter, ExrawWriter
from setk_tpu.utils import get_logger

logger = get_logger(__name__)


def _run(args):
    cfg = stft_config_from_args(args)
    clean_reader = SpectrogramReader(args.clean_scp, cfg=cfg)
    noisy_reader = SpectrogramReader(args.noisy_scp, cfg=cfg)
    writer_cls = {"kaldi": ArchiveWriter, "exraw": ExrawWriter}[args.format]
    num_utts = 0
    with writer_cls(args.mask_ark, args.scp) as writer:
        for key, clean in clean_reader:
            if key not in noisy_reader:
                logger.warning(f"Missing noisy utterance for {key}")
                continue
            noisy = noisy_reader[key]
            mask = np.asarray(
                compute_mask(clean[0] if clean.ndim == 3 else clean,
                             noisy[0] if noisy.ndim == 3 else noisy,
                             args.mask))
            if args.cutoff > 0:
                clipped = int(np.sum(mask > args.cutoff))
                if clipped:
                    logger.info(f"Clip {clipped}"
                                f"({clipped / mask.size:.2f}) items over "
                                f"{args.cutoff:.2f} for utterance {key}")
                mask = np.minimum(mask, args.cutoff)
            below = int(np.sum(mask < 0))
            if below:
                logger.info(f"Clip {below}({below / mask.size:.2f}) items "
                            f"below zero for utterance {key}")
                mask = np.maximum(mask, 0)
            writer.write(key, mask.astype(np.float32))
            num_utts += 1
    logger.info(f"Processed {num_utts} utterances")


def run(args):
    from setk_tpu.utils.hostdev import on_host
    # eager utterance-loop command: pin compute to host CPU
    with on_host():
        _run(args)


def make_parser():
    parser = argparse.ArgumentParser(
        description="Compute T-F masks as training targets "
        "(2-component case: speech & noise)",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
        parents=[StftParser.parser])
    parser.add_argument("clean_scp", help="Clean speech script")
    parser.add_argument("noisy_scp", help="Noisy speech script")
    parser.add_argument("mask_ark", help="Output mask archive")
    parser.add_argument("--format", default="kaldi",
                        choices=["kaldi", "exraw"])
    parser.add_argument("--scp", default="",
                        help="Also emit an index scp")
    parser.add_argument("--mask", default="irm", choices=list(MASK_TYPES))
    parser.add_argument("--cutoff", type=float, default=-1,
                        help="Cutoff for unbounded masks (<=0: none)")
    return parser


if __name__ == "__main__":
    run(make_parser().parse_args())
