#!/usr/bin/env python
"""Mel filterbank features -> archives.

Parity: /root/reference/scripts/sptk/compute_fbank.py (HTK mel scale,
Slaney norm, kaldi/exraw output).
"""

import argparse

import numpy as np

from setk_tpu.cli.common import StftParser, stft_config_from_args, strtobool
from setk_tpu.dsp.mel import mel_filterbank, mel_fbank
from setk_tpu.io import SpectrogramReader, ArchiveWriter, ExrawWriter
from setk_tpu.utils import get_logger

logger = get_logger(__name__)


def _run(args):
    cfg = stft_config_from_args(args)
    if args.max_freq > args.sr // 2:
        raise RuntimeError("Max mel frequency exceeds Nyquist")
    reader = SpectrogramReader(args.wav_scp, cfg=cfg, apply_abs=True)
    weights = mel_filterbank(args.sr, cfg.n_fft, num_mels=args.num_bins,
                             fmin=args.min_freq, fmax=args.max_freq)
    writer_cls = {"kaldi": ArchiveWriter, "exraw": ExrawWriter}[args.format]
    with writer_cls(args.dup_ark, args.scp) as writer:
        for key, spectrum in reader:
            mag = spectrum[0] if spectrum.ndim == 3 else spectrum  # T x F
            fbank = np.asarray(
                mel_fbank(mag.astype(np.float32), weights,
                          apply_log=args.log))
            writer.write(key, fbank.astype(np.float32))
    logger.info(f"Processed {len(reader)} utterances")


def run(args):
    from setk_tpu.utils.hostdev import on_host
    # eager utterance-loop command: pin compute to host CPU
    with on_host():
        _run(args)


def make_parser():
    parser = argparse.ArgumentParser(
        description="Extract mel-fbank features into archives",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
        parents=[StftParser.parser])
    parser.add_argument("wav_scp", help="Input wave scripts")
    parser.add_argument("dup_ark", help="Output archive")
    parser.add_argument("--scp", default="")
    parser.add_argument("--format", default="kaldi",
                        choices=["kaldi", "exraw"])
    parser.add_argument("--num-bins", type=int, default=80,
                        help="Number of mel bins")
    parser.add_argument("--min-freq", type=float, default=0)
    parser.add_argument("--max-freq", type=float, default=8000)
    parser.add_argument("--log", type=strtobool, default=True)
    parser.add_argument("--sr", type=int, default=16000)
    return parser


if __name__ == "__main__":
    run(make_parser().parse_args())
