#!/usr/bin/env python
"""RIR corpus generation for linear arrays.

Parity: /root/reference/scripts/sptk/rir_generate_1d.py — the backend is
this framework's own RIR engine (native C++ or JAX) instead of the
rir-simulate/pyrirgen/gpuRIR subprocess trio.
"""

import argparse

from setk_tpu.cli.common import strtobool, str2tuple
from setk_tpu.sim.room import RirSimulator
from setk_tpu.utils import get_logger

logger = get_logger(__name__)


def run(args):
    sim = RirSimulator(
        args.dump_dir,
        array_topo=tuple(float(t) for t in args.array_topo.split(",")),
        geometry="linear",
        room_dim=args.room_dim,
        rt60=args.rt60,
        abs_range=str2tuple(args.abs_range) if args.abs_range else (0.2, 0.8),
        array_relx=str2tuple(args.array_relx),
        array_rely=str2tuple(args.array_rely),
        array_height=str2tuple(args.array_height),
        speaker_height=str2tuple(args.speaker_height),
        src_dist=str2tuple(args.src_dist),
        num_rooms=args.num_rooms,
        num_rirs=args.num_rirs,
        retry=args.retry,
        vertical=args.vertical,
        rir_dur=args.rir_dur,
        sr=args.sr,
        speed=args.speed,
        engine=args.engine,
        plot=args.plot,
        seed=args.seed)
    sim.run()


def make_parser():
    parser = argparse.ArgumentParser(
        description="Generate RIR corpus for linear arrays",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    parser.add_argument("--dump-dir", default="rir", help="Output directory")
    parser.add_argument("--num-rooms", type=int, default=1)
    parser.add_argument("--num-rirs", type=int, default=1,
                        help="RIRs (speaker positions) per room")
    parser.add_argument("--array-topo", default="0,0.05,0.1,0.15",
                        help="Linear mic offsets (meters)")
    parser.add_argument("--room-dim", default="4,6;8,10;2.4,3",
                        help="Ranges l;w;h, each 'a,b'")
    parser.add_argument("--rt60", default="0.2,0.7",
                        help="RT60 range ('' to use --abs-range)")
    parser.add_argument("--abs-range", default="0.2,0.8",
                        help="Absorption coefficient range")
    parser.add_argument("--array-relx", default="0.4,0.6")
    parser.add_argument("--array-rely", default="0.05,0.1")
    parser.add_argument("--array-height", default="1.2,1.8")
    parser.add_argument("--speaker-height", default="1,2")
    parser.add_argument("--src-dist", default="0.75,3")
    parser.add_argument("--vertical", type=strtobool, default=False)
    parser.add_argument("--retry", type=int, default=5)
    parser.add_argument("--rir-dur", type=float, default=0.5,
                        help="RIR duration (seconds)")
    parser.add_argument("--speed", type=float, default=340)
    parser.add_argument("--sr", type=int, default=16000)
    parser.add_argument("--engine", default="native",
                        choices=["native", "jax"])
    parser.add_argument("--plot", type=strtobool, default=False)
    parser.add_argument("--seed", type=int, default=None)
    return parser


if __name__ == "__main__":
    run(make_parser().parse_args())
