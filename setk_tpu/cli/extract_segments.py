#!/usr/bin/env python
"""Extract utterance segments from long recordings.

Parity: /root/reference/steps/extract_segments.sh (kaldi extract-segments
over a ``segments`` file: <segment-id> <recording-id> <beg-sec> <end-sec>).
"""

import argparse

from setk_tpu.io import SegmentWaveReader, WaveWriter
from setk_tpu.utils import get_logger

logger = get_logger(__name__)


def run(args):
    # SegmentWaveReader stores begin/end as floats; convert sec -> samples
    reader = SegmentWaveReader(args.wav_scp, args.segments, sr=args.sr)
    done = 0
    with WaveWriter(args.dst_dir, args.scp, sr=args.sr) as writer:
        for key in reader.keys():
            info = reader.index_dict[key]
            samps = reader.wav_reader.read(info["wav"],
                                           beg=int(info["beg"] * args.sr),
                                           end=int(info["end"] * args.sr))
            writer.write(key, samps)
            done += 1
    logger.info(f"Extracted {done} segments")


def make_parser():
    parser = argparse.ArgumentParser(
        description="Extract segments (kaldi 'segments' file) into wavs",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    parser.add_argument("wav_scp", help="Recording wave scripts")
    parser.add_argument("segments",
                        help="segments file: seg-id rec-id beg end (sec)")
    parser.add_argument("dst_dir", help="Output directory")
    parser.add_argument("--scp", default="")
    parser.add_argument("--sr", type=int, default=16000)
    return parser


if __name__ == "__main__":
    run(make_parser().parse_args())
