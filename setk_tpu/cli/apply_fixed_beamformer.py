#!/usr/bin/env python
"""Apply pre-designed fixed beam weights (F x N, or B x F x N + beam index).

Parity: /root/reference/scripts/sptk/apply_fixed_beamformer.py.
"""

import argparse

import numpy as np

from setk_tpu.cli.common import StftParser, stft_config_from_args, strtobool
from setk_tpu.dsp.stft import inverse_stft
from setk_tpu.enhance import beamformer as bf
from setk_tpu.io import SpectrogramReader, WaveWriter, ScpReader
from setk_tpu.utils import get_logger

logger = get_logger(__name__)


def _run(args):
    cfg = stft_config_from_args(args)
    reader = SpectrogramReader(args.wav_scp, cfg=cfg, transpose=False)
    weights = np.load(args.weights)
    if weights.ndim not in (2, 3):
        raise RuntimeError(f"Expect 2/3D weights, got {weights.ndim}D")
    utt2beam = None
    if args.utt2beam:
        utt2beam = ScpReader(args.utt2beam,
                             value_processor=int).get
    done = 0
    with WaveWriter(args.dst_dir, sr=args.sr) as writer:
        for key, stft_mat in reader:
            if weights.ndim == 3:
                beam = utt2beam(key) if utt2beam else args.beam
                if beam is None or beam >= weights.shape[0]:
                    logger.warning(f"Invalid beam index for {key}")
                    continue
                w = weights[beam]
            else:
                w = weights
            obs = stft_mat.transpose(1, 0, 2)
            enh = np.asarray(bf.beamform(w.astype(np.complex64), obs))
            norm = reader.maxabs(key) if args.normalize else None
            samps = np.asarray(inverse_stft(enh.T, cfg, norm=norm))
            writer.write(key, samps)
            done += 1
    logger.info(f"Processed {done} utterances over {len(reader)}")


def run(args):
    from setk_tpu.utils.hostdev import on_host
    # eager utterance-loop command: pin compute to host CPU
    with on_host():
        _run(args)


def make_parser():
    parser = argparse.ArgumentParser(
        description="Apply fixed beamformer weights",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
        parents=[StftParser.parser])
    parser.add_argument("wav_scp", help="Multi-channel wave scripts")
    parser.add_argument("weights", help=".npy weights, F x N or B x F x N")
    parser.add_argument("dst_dir", help="Output directory")
    parser.add_argument("--beam", type=int, default=0,
                        help="Beam index for 3D weights")
    parser.add_argument("--utt2beam", default="",
                        help="Per-utterance beam index script")
    parser.add_argument("--normalize", type=strtobool, default=True)
    parser.add_argument("--sr", type=int, default=16000)
    return parser


if __name__ == "__main__":
    run(make_parser().parse_args())
