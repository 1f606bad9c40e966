#!/usr/bin/env python
"""Generate one RIR set from explicit room/source/receiver configuration.

Parity: /root/reference/src/rir-simulate.cc (the C++ image-method CLI) —
same flag vocabulary (--room-topo/--source-location/--receiver-location/
--beta/...), backed by this framework's native/JAX engines.
"""

import argparse

import numpy as np

from setk_tpu.cli.common import strtobool
from setk_tpu.io.wave import write_wav
from setk_tpu.sim.rir import rir_generate, beta_from_t60, t60_from_beta
from setk_tpu.utils import get_logger

logger = get_logger(__name__)


def run(args):
    room = [float(v) for v in args.room_topo.split(",")]
    src = [float(v) for v in args.source_location.split(",")]
    mics = [[float(v) for v in m.split(",")]
            for m in args.receiver_location.split(";")]
    beta_vals = [float(v) for v in args.beta.split(",")]
    kwargs = dict(sr=args.samp_frequency,
                  velocity=args.sound_velocity,
                  order=args.order,
                  hp_filter=bool(args.hp_filter),
                  mic_type=args.microphone_type,
                  engine=args.engine)
    if args.angle:
        kwargs["angle"] = tuple(float(v) for v in args.angle.split(","))
    if len(beta_vals) == 1:
        t60 = beta_vals[0]
        kwargs["t60"] = t60
    elif len(beta_vals) == 6:
        kwargs["beta"] = np.asarray(beta_vals)
        t60 = t60_from_beta(room, beta_vals, args.sound_velocity)
    else:
        raise RuntimeError("--beta expects 1 (T60) or 6 values")
    if args.number_samples > 0:
        kwargs["num_samples"] = args.number_samples
    rir = rir_generate(room, src, mics, **kwargs)
    if args.report:
        logger.info(f"Room {room}, src {src}, {len(mics)} mics, "
                    f"T60 ~ {t60:.3f}s, {rir.shape[1]} samples")
    if args.normalize:
        rir = rir / (np.abs(rir).max() + 1e-7)
    write_wav(args.wav, rir, sr=args.samp_frequency)
    logger.info(f"Wrote {rir.shape} RIRs to {args.wav}")


def make_parser():
    parser = argparse.ArgumentParser(
        description="Image-method RIR simulation (single configuration)",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    parser.add_argument("wav", help="Output wav (one channel per receiver)")
    parser.add_argument("--room-topo", required=True,
                        help="Room dimensions 'l,w,h' (meters)")
    parser.add_argument("--source-location", required=True,
                        help="Source position 'x,y,z'")
    parser.add_argument("--receiver-location", required=True,
                        help="Receivers 'x,y,z;x,y,z;...'")
    parser.add_argument("--beta", required=True,
                        help="T60 seconds (1 value) or 6 reflection coeffs")
    parser.add_argument("--number-samples", type=int, default=-1)
    parser.add_argument("--samp-frequency", type=int, default=16000)
    parser.add_argument("--sound-velocity", type=float, default=340)
    parser.add_argument("--order", type=int, default=-1)
    parser.add_argument("--hp-filter", type=strtobool, default=True)
    parser.add_argument("--microphone-type", default="omnidirectional",
                        choices=["omnidirectional", "subcardioid",
                                 "cardioid", "hypercardioid",
                                 "bidirectional"])
    parser.add_argument("--angle", default="",
                        help="Mic orientation 'azimuth,elevation' radians")
    parser.add_argument("--normalize", type=strtobool, default=False)
    parser.add_argument("--report", type=strtobool, default=True)
    parser.add_argument("--engine", default="native",
                        choices=["native", "jax"])
    return parser


if __name__ == "__main__":
    run(make_parser().parse_args())
