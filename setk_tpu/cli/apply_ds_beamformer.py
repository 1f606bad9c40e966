#!/usr/bin/env python
"""Delay-and-sum beamformer (thin wrapper over apply_classic_beamformer).

Parity: /root/reference/scripts/sptk/apply_ds_beamformer.py.
"""

from setk_tpu.cli import apply_classic_beamformer as classic


def make_parser():
    parser = classic.make_parser()
    parser.description = "Delay-and-sum beamformer"
    return parser


def run(args):
    args.beamformer = "ds"
    classic.run(args)


if __name__ == "__main__":
    run(make_parser().parse_args())
