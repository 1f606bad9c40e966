#!/usr/bin/env python
"""Visualize T-F matrices (masks/features) as images.

Parity: /root/reference/scripts/sptk/visualize_tf_matrix.py.
"""

import argparse
from pathlib import Path

import numpy as np

from setk_tpu.cli.common import strtobool
from setk_tpu.io import NumpyReader, ScriptReader, ArchiveReader
from setk_tpu.utils import get_logger

logger = get_logger(__name__)


def save_figure(key, mat, dest, cmap="jet", hop=256, sr=16000,
                title="", trans=False):
    import matplotlib
    matplotlib.use("agg")
    import matplotlib.pyplot as plt
    if trans:
        mat = mat.T
    fig, ax = plt.subplots()
    ax.imshow(mat.T, origin="lower", cmap=cmap, aspect="auto",
              interpolation="none",
              extent=[0, mat.shape[0] * hop / sr, 0, sr / 2 / 1000])
    ax.set_xlabel("Time (s)")
    ax.set_ylabel("Frequency (kHz)")
    ax.set_title(title or key)
    fig.savefig(dest, dpi=200)
    plt.close(fig)
    logger.info(f"Saved {dest}")


def run(args):
    reader = {
        "numpy": NumpyReader,
        "kaldi": ScriptReader,
    }.get(args.input)
    src = ArchiveReader(args.rspec) if args.input == "ark" \
        else reader(args.rspec)
    cache_dir = Path(args.cache_dir)
    cache_dir.mkdir(exist_ok=True, parents=True)
    for key, mat in src:
        mat = np.asarray(mat)
        if mat.ndim == 3:
            for i, m in enumerate(mat):
                save_figure(key, m, cache_dir / f"{key}-{i + 1}.png",
                            cmap=args.cmap, hop=args.frame_hop, sr=args.sr,
                            trans=args.trans)
        else:
            save_figure(key, mat, cache_dir / f"{key}.png", cmap=args.cmap,
                        hop=args.frame_hop, sr=args.sr, trans=args.trans)


def make_parser():
    parser = argparse.ArgumentParser(
        description="Visualize T-F matrices (masks, spectrograms, ...)",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    parser.add_argument("rspec", help="Input rspecifier")
    parser.add_argument("--input", default="numpy",
                        choices=["numpy", "kaldi", "ark"])
    parser.add_argument("--frame-hop", type=int, default=256)
    parser.add_argument("--sr", type=int, default=16000)
    parser.add_argument("--cmap", default="jet")
    parser.add_argument("--cache-dir", default="figures")
    parser.add_argument("--trans", type=strtobool, default=False,
                        help="Transpose matrices before plotting")
    return parser


if __name__ == "__main__":
    run(make_parser().parse_args())
