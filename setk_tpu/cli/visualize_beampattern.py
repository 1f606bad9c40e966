#!/usr/bin/env python
"""Visualize beam patterns |w^H d(theta, f)| of designed weights.

Parity: /root/reference/scripts/sptk/visualize_beampattern.py.
"""

import argparse
from pathlib import Path

import numpy as np

from setk_tpu.enhance.beamformer import beam_pattern
from setk_tpu.utils import get_logger

logger = get_logger(__name__)


def _run(args):
    weights = np.load(args.weights)  # F x N or B x F x N
    steer = np.load(args.steer_vector)  # A x M x F
    grid = np.ascontiguousarray(steer.transpose(2, 0, 1))  # F x A(D) x N
    import matplotlib
    matplotlib.use("agg")
    import matplotlib.pyplot as plt
    cache_dir = Path(args.cache_dir)
    cache_dir.mkdir(exist_ok=True, parents=True)
    beams = weights[None] if weights.ndim == 2 else weights
    for b, w in enumerate(beams):
        pattern = np.asarray(
            beam_pattern(w.astype(np.complex64), grid.astype(np.complex64)))
        fig, ax = plt.subplots()
        ax.imshow(pattern, origin="lower", cmap=args.cmap, aspect="auto",
                  extent=[0, args.doa_range, 0, args.sr / 2 / 1000])
        ax.set_xlabel("DoA (degrees)")
        ax.set_ylabel("Frequency (kHz)")
        ax.set_title(f"beam-{b}")
        dest = cache_dir / f"beam-{b}.png"
        fig.savefig(dest, dpi=200)
        plt.close(fig)
        logger.info(f"Saved {dest}")


def run(args):
    from setk_tpu.utils.hostdev import on_host
    # eager utterance-loop command: pin compute to host CPU
    with on_host():
        _run(args)


def make_parser():
    parser = argparse.ArgumentParser(
        description="Visualize beam patterns of fixed weights",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    parser.add_argument("weights", help=".npy weights F x N or B x F x N")
    parser.add_argument("steer_vector", help=".npy steering grid A x M x F")
    parser.add_argument("--doa-range", type=float, default=180)
    parser.add_argument("--sr", type=int, default=16000)
    parser.add_argument("--cmap", default="jet")
    parser.add_argument("--cache-dir", default="figures")
    return parser


if __name__ == "__main__":
    run(make_parser().parse_args())
