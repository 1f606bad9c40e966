"""Metrics parity + sanity tests."""

import numpy as np

import reference_oracle as ro

from setk_tpu.metrics import (si_snr, permute_si_snr, edit_distance,
                              permute_ed, bss_eval_sdr)
from setk_tpu.metrics.bss import bss_eval_sources


def test_si_snr_parity(rng):
    x = rng.standard_normal(4000)
    s = x * 0.8 + rng.standard_normal(4000) * 0.1
    ref = ro.ref_metric.si_snr(s, x)
    ours = float(si_snr(s, x))
    assert abs(ours - ref) < 1e-3


def test_permute_si_snr_parity(rng):
    s1 = rng.standard_normal(3000)
    s2 = rng.standard_normal(3000)
    # estimates in swapped order
    est = [s2 + 0.05 * rng.standard_normal(3000),
           s1 + 0.05 * rng.standard_normal(3000)]
    ref = ro.ref_metric.permute_si_snr(est, [s1, s2])
    ours, perm = permute_si_snr(est, [s1, s2], align=True)
    assert abs(ours - ref) < 1e-2
    assert perm == (1, 0)


def test_edit_distance():
    assert edit_distance("kitten", "sitting") == 3
    assert edit_distance([], ["a"]) == 1
    assert edit_distance("abc".split(), "abc".split()) == 0
    h = [["a", "b"], ["c"]]
    r = [["c"], ["a", "b", "d"]]
    assert permute_ed(h, r) == 1  # swap + one insertion distance


def test_bss_eval_sdr_sanity(rng):
    s1 = rng.standard_normal(8000)
    s2 = rng.standard_normal(8000)
    # near-perfect estimates with a small filter + noise
    est1 = np.convolve(s1, [0.9, 0.05], mode="full")[:8000]
    est2 = s2 * 0.7 + rng.standard_normal(8000) * 0.01
    sdr, perm = bss_eval_sdr(np.stack([est2, est1]), np.stack([s1, s2]))
    assert tuple(perm) == (1, 0)  # permutation resolved
    assert sdr.min() > 20  # filtered/scaled versions still score high
    # a garbage estimate scores low
    sdr2, _ = bss_eval_sdr(rng.standard_normal((2, 8000)),
                           np.stack([s1, s2]))
    assert sdr2.max() < 5


def test_bss_eval_single_source(rng):
    s = rng.standard_normal(6000)
    est = s + 0.1 * rng.standard_normal(6000)
    sdr, sir, sar, perm = bss_eval_sources(est, s)
    assert sdr.shape == (1,)
    assert sdr[0] > 15
