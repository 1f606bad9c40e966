"""Device-mesh construction for the enhancement workloads.

The reference's only parallelism is manifest sharding over processes
(/root/reference/utils/run.pl, SURVEY.md §2.3).  Here parallel execution
is a sharded array program over a jax Mesh with three meaningful axes for
this domain:

    data — utterance batch (embarrassing parallelism, the run.pl analog)
    seq  — STFT frame axis T: covariance/EM sufficient statistics are
           sums over T, so sharding T + psum is this domain's sequence
           parallelism (SURVEY.md §5)
    freq — frequency bins F: per-bin solves are independent, so F shards
           like a model axis when a workload exceeds one chip
"""

import math

import jax
import numpy as np
from jax.sharding import Mesh

__all__ = ["factor_devices", "make_mesh", "AXES"]

AXES = ("data", "seq", "freq")


def factor_devices(n_devices: int) -> tuple[int, int, int]:
    """Split n_devices into (data, seq, freq) axis sizes.

    Greedy: prefer data parallelism, then seq, then freq — matching where
    the workload scales most naturally.
    """
    remaining = n_devices
    freq = 1
    seq = 1
    # put at most a factor of 2 on each of seq/freq when available
    for target in (2, 2):
        if remaining % target == 0 and remaining > target:
            if seq == 1:
                seq = target
            else:
                freq = target
            remaining //= target
    return remaining, seq, freq


def make_mesh(n_devices: int | None = None,
              axis_sizes: tuple[int, int, int] | None = None,
              devices=None) -> Mesh:
    """Build a (data, seq, freq) mesh over the first n devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    if axis_sizes is None:
        axis_sizes = factor_devices(n_devices)
    if math.prod(axis_sizes) != n_devices:
        raise ValueError(f"{axis_sizes} does not factor {n_devices}")
    dev_array = np.asarray(devices[:n_devices]).reshape(axis_sizes)
    return Mesh(dev_array, AXES)
