"""Uniform range samplers for room/RIR corpus configuration.

Parity: /root/reference/scripts/sptk/libs/sampler.py (UniformSampler over
"a,b" string ranges or scalars).
"""

import random

from setk_tpu.utils.common import check_doa  # noqa: F401 (re-export site)

__all__ = ["UniformSampler", "parse_range"]


def parse_range(value, sep=","):
    """'a,b' / (a, b) -> (a, b); scalar string/number -> (v, v)."""
    if isinstance(value, (int, float)):
        return float(value), float(value)
    if isinstance(value, (tuple, list)):
        if len(value) == 1:
            return float(value[0]), float(value[0])
        if len(value) == 2:
            return float(value[0]), float(value[1])
        raise ValueError(f"Invalid range spec: {value}")
    toks = str(value).split(sep)
    vals = [float(t) for t in toks]
    if len(vals) == 1:
        return vals[0], vals[0]
    if len(vals) == 2:
        return vals[0], vals[1]
    raise ValueError(f"Invalid range spec: {value}")


class UniformSampler:
    """Sample uniformly from a closed range given as 'min,max' or scalar."""

    def __init__(self, spec, rng=None):
        self.min_value, self.max_value = parse_range(spec)
        self.rng = rng or random

    def sample(self):
        if self.min_value == self.max_value:
            return self.min_value
        return self.rng.uniform(self.min_value, self.max_value)
