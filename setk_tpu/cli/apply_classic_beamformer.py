#!/usr/bin/env python
"""Classic DS/SD beamforming for linear/circular arrays.

Parity: /root/reference/scripts/sptk/apply_classic_beamformer.py —
fixed or per-utterance DoA (--utt2doa), online chunked DoA tracks.
"""

import argparse
import math

import numpy as np

from setk_tpu.cli.common import StftParser, stft_config_from_args, strtobool
from setk_tpu.dsp.stft import inverse_stft
from setk_tpu.enhance import beamformer as bf
from setk_tpu.io import SpectrogramReader, WaveWriter, ScpReader
from setk_tpu.spatial.steer import (linear_steer_vector,
                                    circular_steer_vector, diffuse_covar,
                                    linear_distance_matrix,
                                    circular_distance_matrix)
from setk_tpu.utils import get_logger, check_doa

logger = get_logger(__name__)


def make_weight_fn(args, num_bins):
    """doa (degrees) -> (F, N) weights for the configured array."""
    if args.geometry == "linear":
        topo = [float(t) for t in args.linear_topo.split(",")]
        dist_mat = linear_distance_matrix(topo)
        diag_eps = 0.1

        def steer(doa):
            return linear_steer_vector(topo, doa, num_bins, c=args.speed,
                                       sr=args.sr)
        num_mics = len(topo)
    else:
        dist_mat = circular_distance_matrix(args.circular_radius,
                                            args.circular_around,
                                            center=args.circular_center)
        diag_eps = 1e-5

        def steer(doa):
            return circular_steer_vector(args.circular_radius,
                                         args.circular_around, doa, num_bins,
                                         c=args.speed, sr=args.sr,
                                         center=args.circular_center)
        num_mics = args.circular_around + (1 if args.circular_center else 0)

    if args.beamformer == "ds":
        return lambda doa: bf.ds_weights(steer(doa), num_mics)
    rn = diffuse_covar(num_bins, dist_mat, sr=args.sr, c=args.speed,
                       diag_eps=diag_eps)

    def sd(doa):
        return np.asarray(bf.sd_weights(steer(doa) / num_mics, rn))

    return sd


def parse_doa(args, online):
    if args.utt2doa:
        proc = (lambda d: [float(v) for v in d]) if online else \
            (lambda d: float(d[0] if isinstance(d, list) else d))
        reader = ScpReader(args.utt2doa, value_processor=proc,
                           num_tokens=-1, restrict=False)
        logger.info(f"Use --utt2doa={args.utt2doa} per utterance")
        return reader.get
    doa = [float(v) for v in str(args.doa).split(",")] if online \
        else float(args.doa)
    logger.info(f"Use --doa={args.doa} for all utterances")
    return lambda _: doa


def _run(args):
    cfg = stft_config_from_args(args)
    reader = SpectrogramReader(args.wav_scp, cfg=cfg, transpose=False)
    num_bins = cfg.num_bins
    weight_fn = make_weight_fn(args, num_bins)
    online = args.chunk_len > 0
    utt2doa = parse_doa(args, online)
    done = 0
    with WaveWriter(args.dst_dir, sr=args.sr) as writer:
        for key, stft_src in reader:
            doa = utt2doa(key)
            if doa is None:
                logger.info(f"Missing doa for utterance {key}")
                continue
            if not check_doa(args.geometry, doa, online):
                logger.info(f"Invalid doa {doa} for utterance {key}")
                continue
            obs = stft_src.transpose(1, 0, 2)  # F x N x T
            if online:
                num_chunks = math.ceil(obs.shape[-1] / args.chunk_len)
                if len(doa) != num_chunks:
                    logger.info(f"Invalid chunk count for {key}: "
                                f"{len(doa)} vs {num_chunks}")
                    continue
                chunks = []
                for c, d in enumerate(doa):
                    seg = obs[..., c * args.chunk_len:(c + 1) * args.chunk_len]
                    chunks.append(
                        np.asarray(bf.beamform(weight_fn(d), seg)))
                enh = np.concatenate(chunks, axis=-1)
            else:
                enh = np.asarray(bf.beamform(weight_fn(doa), obs))
            norm = reader.maxabs(key) if args.normalize else None
            samps = np.asarray(inverse_stft(enh.T, cfg, norm=norm))
            writer.write(key, samps)
            done += 1
    logger.info(f"Processed {done} utterances over {len(reader)}")


def run(args):
    from setk_tpu.utils.hostdev import on_host
    # eager utterance-loop command: pin compute to host CPU
    with on_host():
        _run(args)


def make_parser():
    parser = argparse.ArgumentParser(
        description="Classic DS/SD beamformers (linear/circular arrays)",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
        parents=[StftParser.parser])
    parser.add_argument("wav_scp", help="Multi-channel wave scripts")
    parser.add_argument("dst_dir", help="Output directory")
    parser.add_argument("--beamformer", default="ds", choices=["ds", "sd"])
    parser.add_argument("--geometry", default="linear",
                        choices=["linear", "circular"])
    parser.add_argument("--linear-topo", default="0,0.05,0.1,0.15",
                        help="Linear mic positions (meters)")
    parser.add_argument("--circular-radius", type=float, default=0.05)
    parser.add_argument("--circular-around", type=int, default=6)
    parser.add_argument("--circular-center", type=strtobool, default=False)
    parser.add_argument("--doa", default="90",
                        help="DoA in degrees (list when online)")
    parser.add_argument("--utt2doa", default="",
                        help="Per-utterance DoA script")
    parser.add_argument("--chunk-len", type=int, default=-1,
                        help=">0 enables online chunked DoA tracks")
    parser.add_argument("--speed", type=float, default=340)
    parser.add_argument("--normalize", type=strtobool, default=True)
    parser.add_argument("--sr", type=int, default=16000)
    return parser


if __name__ == "__main__":
    run(make_parser().parse_args())
