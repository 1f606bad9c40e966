#!/usr/bin/env python
"""Silence removal via VAD with hangover smoothing.

Parity: /root/reference/scripts/sptk/do_vad.py (frame decisions from the
built-in adaptive-energy VAD instead of py-webrtcvad; same hangover
state machine and segment gathering).
"""

import argparse

import numpy as np

from setk_tpu.enhance.vad import remove_silence
from setk_tpu.io import WaveReader, WaveWriter
from setk_tpu.utils import get_logger

logger = get_logger(__name__)


def _run(args):
    reader = WaveReader(args.wav_scp, sr=args.sr)
    done = 0
    with WaveWriter(args.dst_dir, sr=args.sr) as writer:
        for key, samps in reader:
            voiced, segments = remove_silence(
                samps, sr=args.sr, chunk_ms=args.chunk_size,
                cache_size=args.cache_size,
                threshold_db=args.threshold_db,
                backend=args.backend, mode=args.mode)
            if voiced.shape[-1]:
                writer.write(key, voiced)
                done += 1
            else:
                logger.warning(f"No active segments for utterance {key}")
    logger.info(f"Processed {done} utterances over {len(reader)}")


def run(args):
    from setk_tpu.utils.hostdev import on_host
    # eager utterance-loop command: pin compute to host CPU
    with on_host():
        _run(args)


def make_parser():
    parser = argparse.ArgumentParser(
        description="Remove silence from utterances. DEVIATION from "
        "the reference: py-webrtcvad is unavailable; --backend gmm "
        "reimplements its architecture (6 subband log energies, "
        "2-component speech/noise GMMs, LLR decisions, --mode "
        "aggressiveness 0-3) with self-initialized adaptive models, so "
        "decisions correlate but are not bit-identical; --backend "
        "energy is an adaptive-noise-floor detector tuned by "
        "--threshold-db. Hangover state machine and segment output are "
        "identical to the reference. See doc/MIGRATING.md.",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    parser.add_argument("wav_scp", help="Input wave scripts")
    parser.add_argument("dst_dir", help="Output directory")
    parser.add_argument("--chunk-size", type=int, default=20,
                        help="Frame size in ms")
    parser.add_argument("--cache-size", type=int, default=5,
                        help="Hangover frames to open/close segments")
    parser.add_argument("--backend", choices=("energy", "gmm"),
                        default="energy", help="Frame classifier")
    parser.add_argument("--mode", type=int, default=1,
                        help="GMM backend aggressiveness 0-3 (the "
                        "reference's webrtcvad --mode)")
    parser.add_argument("--threshold-db", type=float, default=6.0,
                        help="Energy-backend over-floor threshold")
    parser.add_argument("--sr", type=int, default=16000)
    return parser


if __name__ == "__main__":
    run(make_parser().parse_args())
