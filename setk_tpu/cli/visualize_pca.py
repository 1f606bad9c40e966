#!/usr/bin/env python
"""PCA scatter of (speaker) embeddings.

Parity: /root/reference/scripts/sptk/visualize_pca.py.
"""

import argparse

import numpy as np

from setk_tpu.io import NumpyReader, ScriptReader, parse_scps
from setk_tpu.utils import get_logger

logger = get_logger(__name__)


def run(args):
    reader = NumpyReader(args.emb_scp) if args.input == "numpy" \
        else ScriptReader(args.emb_scp)
    utt2class = parse_scps(args.utt2class) if args.utt2class else None
    keys, embs = [], []
    for key, vec in reader:
        keys.append(key)
        embs.append(np.asarray(vec).reshape(-1))
    mat = np.stack(embs)
    # PCA via SVD of the centered matrix
    centered = mat - mat.mean(0, keepdims=True)
    _, _, vt = np.linalg.svd(centered, full_matrices=False)
    proj = centered @ vt[:2].T
    import matplotlib
    matplotlib.use("agg")
    import matplotlib.pyplot as plt
    fig, ax = plt.subplots()
    if utt2class:
        classes = sorted({utt2class.get(k, "?") for k in keys})
        for cls in classes:
            idx = [i for i, k in enumerate(keys)
                   if utt2class.get(k, "?") == cls]
            ax.scatter(proj[idx, 0], proj[idx, 1], s=8, label=cls)
        ax.legend(fontsize=6)
    else:
        ax.scatter(proj[:, 0], proj[:, 1], s=8)
    ax.set_title("PCA of embeddings")
    fig.savefig(args.dest, dpi=200)
    plt.close(fig)
    logger.info(f"Saved {args.dest} ({len(keys)} embeddings)")


def make_parser():
    parser = argparse.ArgumentParser(
        description="Visualize embeddings by 2D PCA",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    parser.add_argument("emb_scp", help="Embedding scripts")
    parser.add_argument("dest", help="Output figure path")
    parser.add_argument("--input", default="kaldi",
                        choices=["kaldi", "numpy"])
    parser.add_argument("--utt2class", default="",
                        help="Color points by class")
    return parser


if __name__ == "__main__":
    run(make_parser().parse_args())
