#!/usr/bin/env python
"""Spatial features (SRP-PHAT / IPD / MSC) for linear arrays -> archives.

Parity: /root/reference/scripts/sptk/compute_ipd_and_linear_srp.py.
"""

import argparse

import numpy as np

from setk_tpu.cli.common import StftParser, stft_config_from_args, strtobool
from setk_tpu.io import SpectrogramReader, ArchiveWriter
from setk_tpu.spatial.features import (srp_phat_linear, ipd, msc,
                                       smooth_angular_spectrogram)
from setk_tpu.utils import get_logger

logger = get_logger(__name__)


def compute_spatial_feats(args, cfg, spectra):
    if args.type == "srp":
        topo = [float(t) for t in args.linear_topo.split(",")]
        srp = srp_phat_linear(spectra, topo,
                              sample_frequency=args.samp_frequency,
                              num_doa=args.num_doa,
                              num_bins=cfg.num_bins,
                              samp_doa=not args.samp_tdoa)
        return np.asarray(
            smooth_angular_spectrogram(srp, args.smooth_context))
    if args.type == "ipd":
        if spectra.ndim < 3:
            raise ValueError("IPD needs multi-channel STFT")
        feats = []
        for pair in args.ipd_pair.split(";"):
            left, right = map(int, pair.split(","))
            feats.append(
                np.asarray(ipd(spectra[left], spectra[right],
                               cos=args.ipd_cos, sin=args.ipd_sin)))
        return np.hstack(feats)
    return np.asarray(msc(spectra, context=args.msc_ctx))


def _run(args):
    cfg = stft_config_from_args(args)
    reader = SpectrogramReader(args.wav_scp, cfg=cfg)  # N x T x F
    num_done = 0
    with ArchiveWriter(args.dup_ark, args.scp) as writer:
        for key, spectra in reader:
            feats = compute_spatial_feats(args, cfg, spectra)
            writer.write(key, feats.astype(np.float32))
            num_done += 1
            if num_done % 1000 == 0:
                logger.info(f"Processed {num_done} utterances...")
    logger.info(f"Processed {num_done} utterances over {len(reader)}")


def run(args):
    from setk_tpu.utils.hostdev import on_host
    # eager utterance-loop command: pin compute to host CPU
    with on_host():
        _run(args)


def make_parser():
    parser = argparse.ArgumentParser(
        description="Compute spatial features (srp/ipd/msc)",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
        parents=[StftParser.parser])
    parser.add_argument("wav_scp", help="Multi-channel wave scripts")
    parser.add_argument("dup_ark", help="Output archive")
    parser.add_argument("--scp", default="")
    parser.add_argument("--type", default="srp",
                        choices=["srp", "ipd", "msc"])
    parser.add_argument("--linear-topo", dest="linear_topo",
                        default="0,0.05,0.1,0.15")
    parser.add_argument("--srp.num-doa", dest="num_doa", type=int,
                        default=181)
    parser.add_argument("--srp.samp-tdoa", dest="samp_tdoa",
                        type=strtobool, default=False)
    parser.add_argument("--srp.samp-frequency", dest="samp_frequency",
                        type=int, default=16000)
    parser.add_argument("--srp.smooth-context", "--smooth-context",
                        dest="smooth_context", type=int, default=0,
                        help="Temporal context for angular-spectrogram "
                        "averaging (0 disables; "
                        "reference include/srp-phat.cc Smooth)")
    parser.add_argument("--ipd.pair", dest="ipd_pair", default="0,1",
                        help="Mic pairs, e.g. '0,1;1,2'")
    parser.add_argument("--ipd.cos", dest="ipd_cos", type=strtobool,
                        default=False)
    parser.add_argument("--ipd.sin", dest="ipd_sin", type=strtobool,
                        default=False)
    parser.add_argument("--msc.ctx", dest="msc_ctx", type=int, default=1)
    return parser


if __name__ == "__main__":
    run(make_parser().parse_args())
