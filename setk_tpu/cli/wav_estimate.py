#!/usr/bin/env python
"""Reconstruct waveforms from (log/pow) magnitude features.

Parity: /root/reference/scripts/sptk/wav_estimate.py — uses a reference
phase when given, else Griffin-Lim.
"""

import argparse

import numpy as np

from setk_tpu.cli.common import StftParser, stft_config_from_args, strtobool
from setk_tpu.dsp.stft import inverse_stft
from setk_tpu.dsp.griffin_lim import griffin_lim
from setk_tpu.io import ScriptReader, SpectrogramReader, WaveWriter
from setk_tpu.utils import get_logger

logger = get_logger(__name__)


def _run(args):
    cfg = stft_config_from_args(args)
    feat_reader = ScriptReader(args.feat_scp)
    phase_reader = None
    if args.phase_ref:
        phase_reader = SpectrogramReader(args.phase_ref, cfg=cfg,
                                         transpose=False)
    import jax
    num_done = 0
    with WaveWriter(args.dst_dir, sr=args.sr) as writer:
        for key, feat in feat_reader:
            mag = np.asarray(feat, dtype=np.float32)  # T x F
            if args.apply_log:
                mag = np.exp(mag)
            if args.apply_pow:
                mag = np.sqrt(np.maximum(mag, 0))
            if phase_reader is not None and key in phase_reader:
                pha = phase_reader[key]
                pha = pha[0] if pha.ndim == 3 else pha  # F x T
                spec = mag.T * np.exp(1j * np.angle(pha[:, :mag.shape[0]]))
                samps = np.asarray(inverse_stft(spec.T, cfg))
            else:
                samps = np.asarray(
                    griffin_lim(mag, cfg, key=jax.random.PRNGKey(0),
                                epochs=args.gl_epochs))
            writer.write(key, samps)
            num_done += 1
    logger.info(f"Processed {num_done} utterances")


def run(args):
    from setk_tpu.utils.hostdev import on_host
    # eager utterance-loop command: pin compute to host CPU
    with on_host():
        _run(args)


def make_parser():
    parser = argparse.ArgumentParser(
        description="Estimate waveforms from spectral magnitudes",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
        parents=[StftParser.parser])
    parser.add_argument("feat_scp", help="Magnitude feature scripts (kaldi)")
    parser.add_argument("dst_dir", help="Output directory")
    parser.add_argument("--phase-ref", default="",
                        help="Wave script providing phases")
    parser.add_argument("--apply-log", type=strtobool, default=False,
                        help="Features are log magnitudes")
    parser.add_argument("--apply-pow", type=strtobool, default=False,
                        help="Features are power spectra")
    parser.add_argument("--gl-epochs", type=int, default=30,
                        help="Griffin-Lim iterations")
    parser.add_argument("--sr", type=int, default=16000)
    return parser


if __name__ == "__main__":
    run(make_parser().parse_args())
