#!/usr/bin/env python
"""Copy .mat/.npy matrices into kaldi archives, with trans/log/minus/stack.

Parity: /root/reference/scripts/sptk/copy_mat_to_archive.py.
"""

import argparse

import numpy as np

from setk_tpu.io import NumpyReader, MatReader, ArchiveWriter
from setk_tpu.utils import get_logger, filekey, EPSILON

logger = get_logger(__name__)

SUPPORTED_OPS = ["trans", "log", "minus", "stack"]


def run(args):
    src_reader = NumpyReader(args.src_scp) if args.src == "npy" \
        else MatReader(args.src_scp, args.key)
    ops = [op for op in args.op.split(",") if op]
    for op in ops:
        if op not in SUPPORTED_OPS:
            raise RuntimeError(f"Unknown operation: {op}")
    stack = "stack" in ops
    num_mat = 0
    mat_list = []
    with ArchiveWriter(args.dst_ark, args.scp) as writer:
        for key, mat in src_reader:
            for op in ops:
                if op == "trans":
                    mat = np.transpose(mat)
                elif op == "log":
                    mat = np.log(np.maximum(mat, EPSILON))
                elif op == "minus":
                    mat = 1 - mat
            if stack:
                mat_list.append(mat)
            else:
                writer.write(key, np.asarray(mat, dtype=np.float32))
            num_mat += 1
        if stack:
            mat = np.vstack(mat_list)
            writer.write(filekey(args.dst_ark),
                         np.asarray(mat, dtype=np.float32))
            logger.info(f"Merged {num_mat} matrices into {args.dst_ark}, "
                        f"shape {mat.shape[0]}x{mat.shape[1]}")
    if not stack:
        logger.info(f"Copied {num_mat} matrices into {args.dst_ark}")


def make_parser():
    parser = argparse.ArgumentParser(
        description="Copy .mat/.npy matrices to kaldi archives",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    parser.add_argument("src_scp", help="Scripts for .mat/.npy files")
    parser.add_argument("dst_ark", help="Output archive")
    parser.add_argument("--scp", default="")
    parser.add_argument("--src-format", dest="src", default="npy",
                        choices=["npy", "mat"])
    parser.add_argument("--key", default="data",
                        help="Variable name inside .mat files")
    parser.add_argument("--op", default="",
                        help="Comma-separated ops: trans/log/minus/stack")
    return parser


if __name__ == "__main__":
    run(make_parser().parse_args())
