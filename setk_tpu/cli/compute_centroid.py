#!/usr/bin/env python
"""Per-class centroids of embeddings.

Parity: /root/reference/scripts/sptk/compute_centroid.py — averages
embeddings per class (spk2utt style) and dumps one centroid each.
"""

import argparse

import numpy as np

from setk_tpu.cli.common import strtobool
from setk_tpu.io import parse_scps, NumpyReader, ScriptReader, NumpyWriter
from setk_tpu.utils import get_logger

logger = get_logger(__name__)


def run(args):
    reader_cls = NumpyReader if args.type == "numpy" else ScriptReader
    reader = reader_cls(args.emb_scp)
    spk2utt = parse_scps(args.spk2utt, num_tokens=-1, restrict=False)
    with NumpyWriter(args.dst_dir, args.scp) as writer:
        for spk, utts in spk2utt.items():
            utts = utts if isinstance(utts, list) else [utts]
            embs = [np.asarray(reader[u]).reshape(-1) for u in utts
                    if u in reader]
            if not embs:
                logger.warning(f"No embeddings for class {spk}")
                continue
            centroid = np.mean(np.stack(embs), axis=0)
            if args.normalize:
                centroid = centroid / np.linalg.norm(centroid)
            writer.write(spk, centroid.astype(np.float32))
    logger.info(f"Computed centroids for {len(spk2utt)} classes")


def make_parser():
    parser = argparse.ArgumentParser(
        description="Compute per-class embedding centroids",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    parser.add_argument("emb_scp", help="Embedding scripts")
    parser.add_argument("spk2utt", help="Class to utterance map")
    parser.add_argument("dst_dir", help="Output directory (.npy)")
    parser.add_argument("--scp", default="")
    parser.add_argument("--vector-type", dest="type", default="kaldi",
                        choices=["kaldi", "numpy"])
    parser.add_argument("--normalize", type=strtobool, default=False)
    return parser


if __name__ == "__main__":
    run(make_parser().parse_args())
