#!/usr/bin/env python
"""Single-channel noise suppression (OM-LSA, MCRA/iMCRA) CLI.

Parity: /root/reference/scripts/sptk/apply_ns.py (YAML config; gain or
wave output; the reference hard-codes iMCRA — we expose both).
"""

import argparse

import numpy as np

from setk_tpu.cli.common import StftParser, stft_config_from_args
from setk_tpu.dsp.stft import inverse_stft
from setk_tpu.enhance.ns import mcra_gain, imcra_gain, MCRAConfig, IMCRAConfig
from setk_tpu.io import SpectrogramReader, WaveWriter, NumpyWriter
from setk_tpu.utils import get_logger

logger = get_logger(__name__)


def _run(args):
    cfg = stft_config_from_args(args)
    reader = SpectrogramReader(args.wav_scp, cfg=cfg)  # T x F
    conf = {}
    if args.conf:
        import yaml
        with open(args.conf) as f:
            conf = yaml.safe_load(f) or {}
    if args.estimator == "mcra":
        ns_cfg = MCRAConfig(**conf)
        gain_fn = lambda s: mcra_gain(s, ns_cfg)
    else:
        ns_cfg = IMCRAConfig(**conf)
        gain_fn = lambda s: imcra_gain(s, ns_cfg)
    writer_cls = NumpyWriter if args.output == "gain" else WaveWriter
    writer_args = {} if args.output == "gain" else {"sr": args.sr}
    done = 0
    with writer_cls(args.dst_dir, **writer_args) as writer:
        for key, spectra in reader:
            if spectra.ndim == 3:
                spectra = spectra[0]
            gain = np.asarray(gain_fn(spectra.astype(np.complex64)))
            if args.output == "gain":
                writer.write(key, gain.astype(np.float32))
            else:
                samps = np.asarray(
                    inverse_stft(spectra * gain, cfg,
                                 nsamps=reader.nsamps(key)))
                writer.write(key, samps)
            done += 1
    logger.info(f"Processed {done} utterances")


def run(args):
    from setk_tpu.utils.hostdev import on_host
    # eager utterance-loop command: pin compute to host CPU
    with on_host():
        _run(args)


def make_parser():
    parser = argparse.ArgumentParser(
        description="OM-LSA noise suppression (MCRA/iMCRA estimators)",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
        parents=[StftParser.parser])
    parser.add_argument("wav_scp", help="Noisy wave scripts")
    parser.add_argument("dst_dir", help="Output directory")
    parser.add_argument("--estimator", default="imcra",
                        choices=["mcra", "imcra"])
    parser.add_argument("--conf", default="",
                        help="YAML file of estimator options")
    parser.add_argument("--output", default="wave",
                        choices=["wave", "gain"])
    parser.add_argument("--sr", type=int, default=16000)
    return parser


if __name__ == "__main__":
    run(make_parser().parse_args())
