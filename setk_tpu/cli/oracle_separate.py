#!/usr/bin/env python
"""Oracle multi-speaker separation using ideal masks from references.

Parity: /root/reference/scripts/sptk/oracle_separate.py (iam/ibm/irm/psm
mask types over per-speaker reference scps).
"""

import argparse

import numpy as np

from setk_tpu.cli.common import StftParser, stft_config_from_args, strtobool
from setk_tpu.dsp.stft import inverse_stft
from setk_tpu.enhance.masks import compute_mask
from setk_tpu.io import SpectrogramReader, WaveWriter
from setk_tpu.utils import get_logger

logger = get_logger(__name__)


def _run(args):
    cfg = stft_config_from_args(args)
    mix_reader = SpectrogramReader(args.mix_scp, cfg=cfg, transpose=False)
    ref_readers = [
        SpectrogramReader(scp, cfg=cfg, transpose=False)
        for scp in args.ref_scp.split(",")
    ]
    num_done = 0
    with WaveWriter(args.dst_dir, sr=args.sr) as writer:
        for key, mix in mix_reader:
            if not all(key in r for r in ref_readers):
                logger.warning(f"Missing references for utterance {key}")
                continue
            mix0 = mix[0] if mix.ndim == 3 else mix
            refs = [
                r[key][0] if r[key].ndim == 3 else r[key]
                for r in ref_readers
            ]
            norm = mix_reader.maxabs(key) if args.mixed_norm else None
            if args.mask in ("irm", "ibm"):
                # energy ratios between the references themselves
                mags = np.stack([np.abs(r) for r in refs])
                if args.mask == "irm":
                    masks = mags / np.maximum(mags.sum(0), 1e-7)
                else:
                    masks = (mags == mags.max(0, keepdims=True)).astype(
                        np.float32)
            else:
                masks = np.stack([
                    np.asarray(compute_mask(r, mix0, args.mask))
                    for r in refs
                ])
                masks = np.minimum(masks, args.cutoff) if args.cutoff > 0 \
                    else masks
                masks = np.maximum(masks, 0)
            for idx, mask in enumerate(masks):
                samps = np.asarray(
                    inverse_stft((mix0 * mask).T, cfg,
                                 nsamps=mix_reader.nsamps(key), norm=norm))
                writer.write(f"{key}.spk{idx + 1}", samps)
            num_done += 1
    logger.info(f"Processed {num_done} utterances over {len(mix_reader)}")


def run(args):
    from setk_tpu.utils.hostdev import on_host
    # eager utterance-loop command: pin compute to host CPU
    with on_host():
        _run(args)


def make_parser():
    parser = argparse.ArgumentParser(
        description="Oracle speaker separation via ideal masks",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
        parents=[StftParser.parser])
    parser.add_argument("mix_scp", help="Mixture wave scripts")
    parser.add_argument("ref_scp",
                        help="Comma-separated per-speaker reference scps")
    parser.add_argument("dst_dir", help="Output directory")
    parser.add_argument("--mask", default="irm",
                        choices=["iam", "ibm", "irm", "psm"])
    parser.add_argument("--cutoff", type=float, default=-1)
    parser.add_argument("--mixed-norm", type=strtobool, default=True)
    parser.add_argument("--sr", type=int, default=16000)
    return parser


if __name__ == "__main__":
    run(make_parser().parse_args())
