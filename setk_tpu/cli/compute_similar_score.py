#!/usr/bin/env python
"""Speaker-verification cosine scoring of embeddings.

Parity: /root/reference/scripts/sptk/compute_similar_score.py (emits
"score target/nontarget" lines for kaldi's compute-eer).
"""

import argparse

import numpy as np

from setk_tpu.cli.common import strtobool
from setk_tpu.io import parse_scps, NumpyReader, ScriptReader
from setk_tpu.utils import get_logger

logger = get_logger(__name__)


def run(args):
    utt2spk = parse_scps(args.utt2spk)
    reader_cls = NumpyReader if args.type == "numpy" else ScriptReader
    spk_keys, spk_embs = [], []
    for spkid, vec in reader_cls(args.spks_scp):
        spk_keys.append(spkid)
        spk_embs.append(np.asarray(vec).reshape(-1))
    spks_mat = np.stack(spk_embs)
    if args.normalize:
        spks_mat = spks_mat / np.linalg.norm(spks_mat, axis=1, keepdims=True)
    logger.info(f"Loaded {len(spk_keys)} enrollment embeddings")
    eval_reader = reader_cls(args.eval_scp)
    for uttid, vec in eval_reader:
        vec = np.asarray(vec).reshape(-1)
        spkid = utt2spk[uttid]
        if args.normalize:
            vec = vec / np.linalg.norm(vec)
        if spkid not in spk_keys:
            raise RuntimeError(f"Speaker {spkid} missing from enrollment")
        scores = vec @ spks_mat.T
        for idx, cmpid in enumerate(spk_keys):
            print(f"{scores[idx]:.2f} "
                  f"{'target' if cmpid == spkid else 'nontarget'}")
    logger.info(f"Scored {len(eval_reader)} utterances")


def make_parser():
    parser = argparse.ArgumentParser(
        description="Cosine scoring of speaker embeddings",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    parser.add_argument("spks_scp", help="Enrollment embeddings")
    parser.add_argument("eval_scp", help="Evaluation embeddings")
    parser.add_argument("--utt2spk", required=True)
    parser.add_argument("--vector-type", dest="type", default="kaldi",
                        choices=["kaldi", "numpy"])
    parser.add_argument("--normalize", type=strtobool, default=False)
    return parser


if __name__ == "__main__":
    run(make_parser().parse_args())
