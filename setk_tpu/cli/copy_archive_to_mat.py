#!/usr/bin/env python
"""Copy kaldi archives to .npy/.mat directories.

Parity: /root/reference/scripts/sptk/copy_archive_to_mat.py.
"""

import argparse

import numpy as np

from setk_tpu.cli.common import strtobool
from setk_tpu.io import ScriptReader, ArchiveReader, NumpyWriter, MatWriter
from setk_tpu.utils import get_logger

logger = get_logger(__name__)


def run(args):
    src_reader = ScriptReader(args.src_dec) if args.src == "scp" \
        else ArchiveReader(args.src_dec)
    writer_cls = {"npy": NumpyWriter, "mat": MatWriter}[args.dst]
    num_done = 0
    with writer_cls(args.dst_dir, args.scp) as writer:
        for key, mat in src_reader:
            if args.trans:
                mat = np.transpose(mat)
            writer.write(key, np.asarray(mat))
            num_done += 1
    logger.info(f"Copied {num_done} matrices into {args.dst_dir}")


def make_parser():
    parser = argparse.ArgumentParser(
        description="Copy kaldi archives to numpy/matlab files",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    parser.add_argument("src_dec", help="Input rspecifier (.ark/.scp)")
    parser.add_argument("dst_dir", help="Output directory")
    parser.add_argument("--src-format", dest="src", default="scp",
                        choices=["ark", "scp"])
    parser.add_argument("--dst-format", dest="dst", default="npy",
                        choices=["npy", "mat"])
    parser.add_argument("--transpose", dest="trans", type=strtobool,
                        default=False)
    parser.add_argument("--scp", default="")
    return parser


if __name__ == "__main__":
    run(make_parser().parse_args())
