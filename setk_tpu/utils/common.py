"""Shared numeric constants and small host-side helpers.

Behavioral parity targets: /root/reference/scripts/sptk/libs/utils.py:15-27
(EPSILON, MAX_INT16, nextpow2) and :248-263 (check_doa).
"""

import math
import os

import numpy as np

# float32 machine epsilon — the toolkit-wide flooring constant
EPSILON = float(np.finfo(np.float32).eps)
MAX_INT16 = np.iinfo(np.int16).max

# MXU matmul precision for Gram matrices feeding Cholesky/EVD.  TPU
# einsums default to bf16 passes; a ~1e-2-relative error on a
# near-singular tap/weighted covariance swamps the 1e-6-relative
# diagonal loading and turns the matrix indefinite (Cholesky -> NaN,
# observed on WPE tap correlations of tonal signals).  These Gram
# accumulations are tiny-FLOP next to their pipelines, so full-f32
# passes cost nothing measurable.
GRAM_PRECISION = "highest"


def nextpow2(n: int) -> int:
    """Smallest power of two >= n."""
    return 2**math.ceil(math.log2(n))


def filekey(path: str) -> str:
    """Unique utterance key from a file name (basename minus last extension)."""
    fname = os.path.basename(path)
    if not fname:
        raise ValueError(f"{path}: is directory path?")
    token = fname.split(".")
    if len(token) == 1:
        return token[0]
    return ".".join(token[:-1])


def check_doa(geometry: str, doa, online: bool = False) -> bool:
    """Validate DoA range: [0, 180] for linear arrays, [0, 360) for circular."""
    doas = doa if online else [doa]
    for d in doas:
        if d < 0:
            return False
        if geometry == "linear" and d > 180:
            return False
        if geometry == "circular" and d >= 360:
            return False
    return True
