"""Shared CLI plumbing: argparse fragments + utterance-loop helpers.

Parity: /root/reference/scripts/sptk/libs/opts.py (StftParser & str2tuple)
plus jit-friendly helpers: pad-to-bucket so per-utterance jitted pipelines
reuse a bounded set of compiled shapes.
"""

import argparse

import numpy as np

__all__ = [
    "StftParser", "str2tuple", "strtobool", "stft_config_from_args",
    "pad_to_bucket", "bucket_frames"
]


def strtobool(value):
    value = str(value).lower()
    if value in ("y", "yes", "t", "true", "on", "1"):
        return True
    if value in ("n", "no", "f", "false", "off", "0"):
        return False
    raise ValueError(f"Invalid bool value: {value}")


def str2tuple(string, sep=","):
    """Map "1.0,2.0" => (1.0, 2.0)."""
    return tuple(map(float, string.split(sep)))


class StftParser:
    """Shared STFT argparse fragment (same flags as the reference)."""
    parser = argparse.ArgumentParser(add_help=False)
    parser.add_argument("--frame-len", type=int, default=512,
                        help="Frame length in number of samples")
    parser.add_argument("--frame-hop", type=int, default=256,
                        help="Frame shift in number of samples")
    parser.add_argument("--center", type=strtobool, default=True,
                        help="Center padding for the STFT")
    parser.add_argument("--round-power-of-two", type=strtobool, default=True,
                        help="If true, pad FFT size to a power of two")
    parser.add_argument("--window", type=str, default="hann",
                        help="Type of window function "
                        "(hann/sqrthann/hamming/blackman/rect)")


def stft_config_from_args(args):
    from setk_tpu.dsp.stft import StftConfig
    return StftConfig(frame_len=args.frame_len,
                      frame_hop=args.frame_hop,
                      window=args.window,
                      center=bool(args.center),
                      round_power_of_two=bool(args.round_power_of_two))


def bucket_frames(n: int, bucket: int = 64) -> int:
    """Round a frame count up to the next bucket multiple (compile reuse)."""
    return -(-n // bucket) * bucket


def pad_to_bucket(arr: np.ndarray, axis: int, bucket: int = 64):
    """Zero-pad one axis to a bucket multiple; returns (padded, orig_len)."""
    n = arr.shape[axis]
    target = bucket_frames(n, bucket)
    if target == n:
        return arr, n
    width = [(0, 0)] * arr.ndim
    width[axis] = (0, target - n)
    return np.pad(arr, width), n
