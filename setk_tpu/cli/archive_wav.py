#!/usr/bin/env python
"""Archive wav files into one binary ark with offset scp (wav-ark).

Parity: /root/reference/steps/archive_wav.sh (wav-copy into .ark) — the
output scp's ``path:offset`` entries read back through WaveReader's
wav-ark support.
"""

import argparse
import struct
from pathlib import Path

import numpy as np

from setk_tpu.io import WaveReader, parse_scps
from setk_tpu.utils import get_logger

logger = get_logger(__name__)


def _wav_bytes(samps, sr):
    pcm = np.clip(np.round(samps * 32768.0), -32768, 32767).astype("<i2")
    if pcm.ndim != 1:
        pcm = np.ascontiguousarray(pcm.T)  # C x N -> N x C interleaved
    channels = 1 if pcm.ndim == 1 else pcm.shape[1]
    data = pcm.tobytes()
    block = channels * 2
    hdr = b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
    hdr += b"fmt " + struct.pack("<IHHIIHH", 16, 1, channels, sr,
                                 sr * block, block, 16)
    hdr += b"data" + struct.pack("<I", len(data))
    return hdr + data


def run(args):
    reader = WaveReader(args.wav_scp, sr=args.sr)
    ark_path = Path(args.ark).absolute()
    ark_path.parent.mkdir(parents=True, exist_ok=True)
    done = 0
    with open(ark_path, "wb") as ark, open(args.scp, "w") as scp:
        for key, samps in reader:
            offset = ark.tell()
            ark.write(_wav_bytes(samps, args.sr))
            scp.write(f"{key}\t{ark_path}:{offset}\n")
            done += 1
    logger.info(f"Archived {done} wavs into {ark_path}")


def make_parser():
    parser = argparse.ArgumentParser(
        description="Archive wavs into a single .ark with offset scp",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    parser.add_argument("wav_scp", help="Input wave scripts")
    parser.add_argument("ark", help="Output wav ark")
    parser.add_argument("scp", help="Output offset scp")
    parser.add_argument("--sr", type=int, default=16000)
    return parser


if __name__ == "__main__":
    run(make_parser().parse_args())
