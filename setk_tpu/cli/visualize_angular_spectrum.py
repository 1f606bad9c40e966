#!/usr/bin/env python
"""Visualize angular spectra (e.g. SRP features) over time.

Parity: /root/reference/scripts/sptk/visualize_angular_spectrum.py.
"""

import argparse
from pathlib import Path

import numpy as np

from setk_tpu.io import NumpyReader, ScriptReader
from setk_tpu.utils import get_logger

logger = get_logger(__name__)


def run(args):
    reader = NumpyReader(args.spec_scp) if args.input == "numpy" \
        else ScriptReader(args.spec_scp)
    import matplotlib
    matplotlib.use("agg")
    import matplotlib.pyplot as plt
    cache_dir = Path(args.cache_dir)
    cache_dir.mkdir(exist_ok=True, parents=True)
    for key, mat in reader:
        mat = np.asarray(mat)  # T x A
        fig, ax = plt.subplots()
        ax.imshow(mat.T, origin="lower", cmap=args.cmap, aspect="auto",
                  extent=[0, mat.shape[0] * args.frame_hop / args.sr, 0,
                          args.doa_range])
        ax.set_xlabel("Time (s)")
        ax.set_ylabel("DoA (degrees)")
        ax.set_title(key)
        dest = cache_dir / f"{key}.png"
        fig.savefig(dest, dpi=200)
        plt.close(fig)
        logger.info(f"Saved {dest}")


def make_parser():
    parser = argparse.ArgumentParser(
        description="Visualize angular spectra",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    parser.add_argument("spec_scp", help="Angular spectrum scripts")
    parser.add_argument("--input", default="kaldi",
                        choices=["kaldi", "numpy"])
    parser.add_argument("--frame-hop", type=int, default=256)
    parser.add_argument("--doa-range", type=float, default=180)
    parser.add_argument("--sr", type=int, default=16000)
    parser.add_argument("--cmap", default="jet")
    parser.add_argument("--cache-dir", default="figures")
    return parser


if __name__ == "__main__":
    run(make_parser().parse_args())
