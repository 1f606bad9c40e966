#!/usr/bin/env python
"""Superdirective beamformer (thin wrapper over apply_classic_beamformer).

Parity: /root/reference/scripts/sptk/apply_sd_beamformer.py.
"""

from setk_tpu.cli import apply_classic_beamformer as classic


def make_parser():
    parser = classic.make_parser()
    parser.description = "Superdirective beamformer (diffuse noise field)"
    return parser


def run(args):
    args.beamformer = "sd"
    classic.run(args)


if __name__ == "__main__":
    run(make_parser().parse_args())
