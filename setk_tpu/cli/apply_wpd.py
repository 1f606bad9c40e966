#!/usr/bin/env python
"""Factored WPD (joint dereverberation + denoising) CLI.

Parity: /root/reference/scripts/sptk/apply_wpd.py — dumps the enhanced
wave plus the estimated T-F mask.
"""

import argparse

import numpy as np

from setk_tpu.cli.common import StftParser, stft_config_from_args, strtobool
from setk_tpu.enhance.wpe import wpd
from setk_tpu.dsp.stft import inverse_stft
from setk_tpu.io import SpectrogramReader, WaveWriter, NumpyWriter
from setk_tpu.utils import get_logger

logger = get_logger(__name__)


def _run(args):
    cfg = stft_config_from_args(args)
    reader = SpectrogramReader(args.wav_scp, cfg=cfg, transpose=False)
    mask_writer = NumpyWriter(args.mask_dir) if args.mask_dir else None
    num_done = 0
    with WaveWriter(args.dst_dir, sr=args.sr) as writer:
        if mask_writer:
            mask_writer.__enter__()
        for key, stft_mat in reader:
            obs = stft_mat.transpose(1, 0, 2).astype(np.complex64)
            mask, enh = wpd(obs, cgmm_iters=args.cgmm_iters,
                            wpd_iters=args.wpd_iters, taps=args.taps,
                            delay=args.delay, context=args.context,
                            update_alpha=args.update_alpha)
            samps = np.asarray(
                inverse_stft(np.asarray(enh).T, cfg,
                             nsamps=reader.nsamps(key)))
            if not np.isfinite(samps).all():
                # the reference skips the utterance when a per-bin
                # solve fails (apply_wpe.py:54-56); XLA yields NaN
                logger.warning(f"{key}: non-finite output, skipping")
                continue
            writer.write(key, samps)
            if mask_writer:
                mask_writer.write(key, np.asarray(mask).T.astype(np.float32))
            num_done += 1
    if mask_writer:
        mask_writer.__exit__()
    logger.info(f"Processed {num_done} utterances over {len(reader)}")


def run(args):
    from setk_tpu.utils.hostdev import on_host
    # eager utterance-loop command: pin compute to host CPU
    with on_host():
        _run(args)


def make_parser():
    parser = argparse.ArgumentParser(
        description="Factored WPD: joint dereverberation & denoising",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
        parents=[StftParser.parser])
    parser.add_argument("wav_scp", help="Multi-channel wave scripts")
    parser.add_argument("dst_dir", help="Output directory")
    parser.add_argument("--mask-dir", default="",
                        help="Also dump estimated T-F masks (.npy)")
    parser.add_argument("--taps", type=int, default=10)
    parser.add_argument("--delay", type=int, default=3)
    parser.add_argument("--context", type=int, default=1)
    parser.add_argument("--cgmm-iters", type=int, default=10)
    parser.add_argument("--wpd-iters", type=int, default=3)
    parser.add_argument("--update-alpha", type=strtobool, default=False)
    parser.add_argument("--sr", type=int, default=16000)
    return parser


if __name__ == "__main__":
    run(make_parser().parse_args())
