#!/usr/bin/env python
"""Copy a MATLAB (complex) matrix into a kaldi binary matrix (FCM/DCM).

Parity: /root/reference/scripts/sptk/copy_complex_mat.py.
"""

import argparse

import numpy as np

from setk_tpu.cli.common import strtobool
from setk_tpu.io import kaldi
from setk_tpu.utils import get_logger

logger = get_logger(__name__)


def run(args):
    import scipy.io as sio
    mdict = sio.loadmat(args.mmat)
    if args.key not in mdict:
        raise KeyError(f"Variable '{args.key}' not in {args.mmat}")
    mmat = mdict[args.key]
    if mmat.dtype not in (np.float32, np.float64, np.complex64,
                          np.complex128):
        raise TypeError(f"Unsupported dtype {mmat.dtype}")
    logger.info(f"Detected input dtype={mmat.dtype}")
    if args.transpose:
        mmat = np.transpose(mmat)
    if args.double:
        mmat = mmat.astype(
            np.complex128 if np.iscomplexobj(mmat) else np.float64)
    if args.float:
        mmat = mmat.astype(
            np.complex64 if np.iscomplexobj(mmat) else np.float32)
    with open(args.kmat, "wb") as f:
        kaldi.write_binary_symbol(f)
        kaldi.write_value(f, np.ascontiguousarray(mmat))
    logger.info(f"Wrote {mmat.shape} {mmat.dtype} matrix to {args.kmat}")


def make_parser():
    parser = argparse.ArgumentParser(
        description="Copy MATLAB (complex) matrices to kaldi binary format",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    parser.add_argument("mmat", help="Input .mat file")
    parser.add_argument("kmat", help="Output kaldi binary matrix")
    parser.add_argument("--key", default="data")
    parser.add_argument("--transpose", type=strtobool, default=False)
    parser.add_argument("--double", type=strtobool, default=False)
    parser.add_argument("--float", type=strtobool, default=False)
    return parser


if __name__ == "__main__":
    run(make_parser().parse_args())
