#!/usr/bin/env python
"""T-F mask separation: mask x STFT -> iSTFT.

Parity: /root/reference/scripts/sptk/wav_separate.py (optional phase
reference, mixed-norm, keep-length).
"""

import argparse

import numpy as np

from setk_tpu.cli.common import StftParser, stft_config_from_args, strtobool
from setk_tpu.dsp.stft import inverse_stft
from setk_tpu.io import SpectrogramReader, MaskReader, WaveWriter
from setk_tpu.utils import get_logger

logger = get_logger(__name__)


def _run(args):
    cfg = stft_config_from_args(args)
    reader = SpectrogramReader(args.wav_scp, cfg=cfg, transpose=False)
    mask_reader = MaskReader(args.fmt, args.mask_scp)
    phase_reader = None
    if args.phase_ref:
        phase_reader = SpectrogramReader(args.phase_ref, cfg=cfg,
                                         transpose=False)
    num_done = 0
    with WaveWriter(args.dst_dir, sr=args.sr) as writer:
        for key, stft_mat in reader:
            if key not in mask_reader:
                logger.warning(f"Missing mask for utterance {key}")
                continue
            norm = reader.maxabs(key) if args.mixed_norm else None
            mask = np.asarray(mask_reader[key])
            spectra = stft_mat[0] if stft_mat.ndim == 3 else stft_mat
            # masks arrive T x F (or F x T) — align to F x T
            if mask.shape == spectra.shape[::-1]:
                mask = mask.T
            if mask.shape != spectra.shape:
                raise RuntimeError(
                    f"Mask/spectrogram mismatch: {mask.shape} vs "
                    f"{spectra.shape}")
            if phase_reader is not None:
                pha = phase_reader[key]
                pha = pha[0] if pha.ndim == 3 else pha
                spectra = np.abs(spectra) * np.exp(1j * np.angle(pha))
            enh = spectra * mask
            nsamps = reader.nsamps(key) if args.keep_length else None
            samps = np.asarray(
                inverse_stft(enh.T, cfg, nsamps=nsamps, norm=norm))
            writer.write(key, samps)
            num_done += 1
    logger.info(f"Processed {num_done} utterances over {len(reader)}")


def run(args):
    from setk_tpu.utils.hostdev import on_host
    # eager utterance-loop command: pin compute to host CPU
    with on_host():
        _run(args)


def make_parser():
    parser = argparse.ArgumentParser(
        description="Separate target component via T-F masks",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
        parents=[StftParser.parser])
    parser.add_argument("wav_scp", help="Mixture wave scripts")
    parser.add_argument("mask_scp", help="T-F mask scripts")
    parser.add_argument("dst_dir", help="Output directory")
    parser.add_argument("--fmt", default="kaldi",
                        choices=["kaldi", "numpy", "exraw"])
    parser.add_argument("--phase-ref", default="",
                        help="Use phase from this wave script instead")
    parser.add_argument("--mixed-norm", "--use-mixed-norm",
                        dest="mixed_norm", type=strtobool, default=True,
                        help="Normalize output peak to the mixture's")
    parser.add_argument("--keep-length", type=strtobool, default=True)
    parser.add_argument("--sr", type=int, default=16000)
    return parser


if __name__ == "__main__":
    run(make_parser().parse_args())
