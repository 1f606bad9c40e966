#!/usr/bin/env python
"""Feature utilities: per-utt CMVN, element/row scaling, modify ops, power.

Subsumes the reference's small Kaldi C++ binaries
(/root/reference/src/apply-cmvn-perutt.cc, matrix-scale-elements.cc,
matrix-scale-rows.cc, modify-feats.cc, wav-to-power.cc) as one batched
command with a ``--task`` switch.
"""

import argparse

import numpy as np

from setk_tpu.cli.common import strtobool
from setk_tpu.io import (ScriptReader, ArchiveReader, ArchiveWriter,
                         WaveReader)
from setk_tpu.utils import get_logger, EPSILON

logger = get_logger(__name__)


def cmvn(mat, norm_vars=False):
    """Per-utterance cepstral mean (and variance) normalization."""
    mat = mat - mat.mean(axis=0, keepdims=True)
    if norm_vars:
        mat = mat / np.maximum(mat.std(axis=0, keepdims=True), EPSILON)
    return mat


def modify(mat, op, n=-1):
    """average/sum/sample/index ops (modify-feats.cc parity)."""
    if op == "average":
        return mat.mean(axis=0, keepdims=True)
    if op == "sum":
        return mat.sum(axis=0, keepdims=True)
    if op == "index":
        if not 0 <= n < mat.shape[0]:
            raise RuntimeError(f"Invalid --n={n} for {mat.shape[0]} rows")
        return mat[n:n + 1]
    if op == "sample":
        idx = np.random.randint(0, mat.shape[0])
        return mat[idx:idx + 1]
    raise ValueError(f"Unknown operator: {op}")


def _feat_reader(rspec):
    return ArchiveReader(rspec) if rspec.endswith(".ark") \
        else ScriptReader(rspec)


def run(args):
    if args.task == "wav-to-power":
        reader = WaveReader(args.rspec, sr=None)
        stats = []
        with open(args.wspec, "w") as out:
            for key, samps in reader:
                s = samps if samps.ndim == 1 else samps[0]
                power = float(np.sum(s.astype(np.float64)**2) / s.size)
                power_db = 10 * np.log10(power + EPSILON)
                out.write(f"{key}\t{power_db:.4f}\n")
                stats.append(power_db)
        logger.info(f"Power dB over {len(stats)} utts: "
                    f"min {min(stats):.2f} max {max(stats):.2f} "
                    f"mean {np.mean(stats):.2f}")
        return
    reader = _feat_reader(args.rspec)
    scale_reader = None
    if args.task in ("scale-elements", "scale-rows"):
        if not args.scale_rspec:
            raise RuntimeError(f"--scale-rspec required for {args.task}")
        scale_reader = _feat_reader(args.scale_rspec)
    num_done = 0
    with ArchiveWriter(args.wspec, args.scp) as writer:
        for key, mat in reader:
            mat = np.asarray(mat, dtype=np.float32)
            if args.task == "cmvn":
                out = cmvn(mat, norm_vars=args.norm_vars)
            elif args.task == "modify":
                out = modify(mat, args.op, n=args.n)
                if args.output_vector and out.shape[0] == 1:
                    out = out[0]
            elif args.task == "scale-elements":
                scale = np.asarray(scale_reader[key])
                out = mat * scale
            elif args.task == "scale-rows":
                scale = np.asarray(scale_reader[key]).reshape(-1, 1)
                out = mat * scale
            else:
                raise ValueError(f"Unknown task: {args.task}")
            writer.write(key, out)
            num_done += 1
    logger.info(f"Processed {num_done} utterances")


def make_parser():
    parser = argparse.ArgumentParser(
        description="Feature utilities: cmvn/modify/scale/wav-to-power",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    parser.add_argument("task",
                        choices=["cmvn", "modify", "scale-elements",
                                 "scale-rows", "wav-to-power"])
    parser.add_argument("rspec", help="Input rspecifier")
    parser.add_argument("wspec", help="Output archive / text file")
    parser.add_argument("--scp", default="")
    parser.add_argument("--norm-vars", type=strtobool, default=False)
    parser.add_argument("--op", default="average",
                        choices=["average", "sum", "sample", "index"])
    parser.add_argument("--n", type=int, default=-1)
    parser.add_argument("--output-vector", type=strtobool, default=False)
    parser.add_argument("--scale-rspec", default="",
                        help="Scales for scale-elements/scale-rows")
    return parser


if __name__ == "__main__":
    run(make_parser().parse_args())
