#!/usr/bin/env python
"""utt2dur from wav headers without reading samples.

Parity: /root/reference/scripts/sptk/wav_duration.py.
"""

import argparse

from setk_tpu.io import parse_scps
from setk_tpu.io.wave import wav_duration
from setk_tpu.utils import get_logger

logger = get_logger(__name__)


def run(args):
    wav_scp = parse_scps(args.wav_scp)
    with open(args.utt2dur, "w") as out:
        for key, path in wav_scp.items():
            dur = wav_duration(path)
            out.write(f"{key}\t{dur:.4f}\n" if args.output == "time"
                      else f"{key}\t{int(dur * args.sr)}\n")
    logger.info(f"Processed {len(wav_scp)} utterances")


def make_parser():
    parser = argparse.ArgumentParser(
        description="Compute utterance durations from wav headers",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    parser.add_argument("wav_scp", help="Input wave scripts")
    parser.add_argument("utt2dur", help="Output duration script")
    parser.add_argument("--output", default="time",
                        choices=["time", "sample"])
    parser.add_argument("--sr", type=int, default=16000)
    return parser


if __name__ == "__main__":
    run(make_parser().parse_args())
