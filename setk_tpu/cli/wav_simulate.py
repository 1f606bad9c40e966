#!/usr/bin/env python
"""Multi-channel audio data simulation (RIR convolution + SNR/SDR mixing).

Parity: /root/reference/scripts/sptk/wav_simulate.py (same flags, RTF
report, mix + per-source reference dumping).
"""

import argparse
import os
import time
from pathlib import Path

import numpy as np
# pre-import scipy's FFT machinery OUTSIDE the RTF timer: the host
# convolution path uses scipy.signal.fftconvolve and the reference CLI
# likewise imports scipy.signal at module scope before its timer starts
# (/root/reference/scripts/sptk/wav_simulate.py:12) — a cold scipy
# import costs ~3.5 s in this image, 30x the simulation itself
import scipy.signal  # noqa: F401

from setk_tpu.cli.common import strtobool
from setk_tpu.io.wave import read_wav, write_wav
from setk_tpu.sim.mixer import simulate
from setk_tpu.utils import get_logger

logger = get_logger(__name__)


def _load_audio(spec, beg=None, end=None, sr=16000):
    if not spec:
        return None
    paths = spec.split(",")
    begs = [int(v) for v in beg.split(",")] if beg else [0] * len(paths)
    ends = [int(v) for v in end.split(",")] if end else [None] * len(paths)
    return [read_wav(p, beg=b, end=e, sr=sr)
            for p, b, e in zip(paths, begs, ends)]


def _floats(spec):
    return [float(s) for s in spec.split(",")] if spec else None


def _ints(spec):
    return [int(float(s)) for s in spec.split(",")] if spec else None


def run(args):
    start = time.time()
    src_spk = _load_audio(args.src_spk, sr=args.sr)
    src_rir = _load_audio(args.src_rir, sr=args.sr)
    if src_rir and len(src_rir) != len(src_spk):
        raise RuntimeError("--src-rir count does not match --src-spk")
    src_begin = _ints(args.src_begin) or [0] * len(src_spk)
    mix_nsamps = max(b + s.shape[-1] for b, s in zip(src_begin, src_spk))

    point_noise = None
    if args.point_noise:
        n_noise = len(args.point_noise.split(","))
        offsets = args.point_noise_offset or \
            ",".join(["0"] * n_noise)
        ends = ",".join(str(int(v) + mix_nsamps)
                        for v in offsets.split(","))
        point_noise = _load_audio(args.point_noise, beg=offsets, end=ends,
                                  sr=args.sr)
    iso = None
    if args.isotropic_noise:
        iso = _load_audio(args.isotropic_noise,
                          beg=str(args.isotropic_noise_offset),
                          end=str(args.isotropic_noise_offset + mix_nsamps),
                          sr=args.sr)[0]

    # single-utterance CLI regime: route the convolutions through the
    # pure-numpy/scipy host path — on a remote-compile accelerator a
    # fresh process would pay a per-shape tunnel compile (seconds)
    # against a ~100 ms simulation, and even the CPU jax path costs
    # seconds of trace+compile plus ~75 ms of backend init
    # (host_hint's docstring).  Corpus-scale simulation batches on the
    # accelerator instead (benchmarks/bench_sim.py batched row).
    from setk_tpu.utils.hostdev import host_hint
    with host_hint():
        mix, spk_refs, noise = simulate(
            src_spk,
            src_begin=src_begin,
            sdr=_floats(args.src_sdr),
            src_rir=src_rir,
            point_noise=point_noise,
            point_noise_rir=_load_audio(args.point_noise_rir, sr=args.sr),
            point_noise_snr=_floats(args.point_noise_snr),
            point_noise_begin=_ints(args.point_noise_begin),
            point_noise_repeat=bool(args.point_noise_repeat),
            isotropic_noise=iso,
            isotropic_snr=(_floats(args.isotropic_noise_snr) or [None])[0],
            dump_channel=args.dump_channel,
            norm_factor=args.norm_factor,
            sr=args.sr)

    utt_dur = mix.shape[-1] / float(args.sr)
    cost = time.time() - start
    print(f"Time cost: {cost:.4f}s, Utterance duration: {utt_dur:.2f}s, "
          f"RTF = {cost / utt_dur:.4f}", flush=True)
    write_wav(args.mix, mix, sr=args.sr)
    if args.dump_ref_dir:
        base = os.path.basename(args.mix)
        ref_dir = Path(args.dump_ref_dir)
        if noise is not None:
            write_wav(ref_dir / "noise" / base, noise, sr=args.sr)
        if len(spk_refs) == 1:
            write_wav(ref_dir / "clean" / base, spk_refs[0], sr=args.sr)
        else:
            for i, s in enumerate(spk_refs):
                write_wav(ref_dir / f"spk{i + 1}" / base, s, sr=args.sr)


def make_parser():
    parser = argparse.ArgumentParser(
        description="Audio data simulation",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    parser.add_argument("mix", help="Output mixture wav")
    parser.add_argument("--dump-ref-dir", default="")
    parser.add_argument("--src-spk", required=True,
                        help="Source speakers: spk1.wav,spk2.wav")
    parser.add_argument("--src-rir", default="")
    parser.add_argument("--src-sdr", default="")
    parser.add_argument("--src-begin", default="")
    parser.add_argument("--point-noise", default="")
    parser.add_argument("--point-noise-rir", default="")
    parser.add_argument("--point-noise-snr", default="")
    parser.add_argument("--point-noise-begin", default="")
    parser.add_argument("--point-noise-offset", default="")
    parser.add_argument("--point-noise-repeat", type=strtobool,
                        default=False)
    parser.add_argument("--isotropic-noise", default="")
    parser.add_argument("--isotropic-noise-snr", default="")
    parser.add_argument("--isotropic-noise-offset", type=int, default=0)
    parser.add_argument("--dump-channel", type=int, default=-1)
    parser.add_argument("--norm-factor", type=float, default=0.9)
    parser.add_argument("--sr", type=int, default=16000)
    return parser


if __name__ == "__main__":
    run(make_parser().parse_args())
