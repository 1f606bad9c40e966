#!/usr/bin/env python
"""AuxIVA blind source separation CLI.

Parity: /root/reference/scripts/sptk/apply_auxiva.py.
"""

import argparse
from pathlib import Path

import numpy as np

from setk_tpu.cli.common import StftParser, stft_config_from_args
from setk_tpu.dsp.stft import inverse_stft
from setk_tpu.enhance.auxiva import auxiva
from setk_tpu.io import SpectrogramReader
from setk_tpu.io.wave import write_wav
from setk_tpu.utils import get_logger

logger = get_logger(__name__)


def _run(args):
    cfg = stft_config_from_args(args)
    reader = SpectrogramReader(args.wav_scp, cfg=cfg)  # N x T x F
    for key, spectra in reader:
        logger.info(f"Processing utterance {key}...")
        separated = np.asarray(
            auxiva(spectra.astype(np.complex64), epochs=args.epochs))
        norm = reader.maxabs(key)
        for idx in range(separated.shape[0]):
            samps = np.asarray(
                inverse_stft(separated[idx], cfg, norm=float(norm)))
            write_wav(Path(args.dst_dir) / f"{key}.src{idx + 1}.wav", samps,
                      sr=args.sr)
    logger.info(f"Processed {len(reader)} utterances")


def run(args):
    from setk_tpu.utils.hostdev import on_host
    # eager utterance-loop command: pin compute to host CPU
    with on_host():
        _run(args)


def make_parser():
    parser = argparse.ArgumentParser(
        description="AuxIVA blind source separation",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
        parents=[StftParser.parser])
    parser.add_argument("wav_scp", help="Multi-channel wave scripts")
    parser.add_argument("dst_dir", help="Output directory")
    parser.add_argument("--epochs", type=int, default=20)
    parser.add_argument("--sr", type=int, default=16000)
    return parser


if __name__ == "__main__":
    run(make_parser().parse_args())
