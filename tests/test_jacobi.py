"""Batched Jacobi eigensolver correctness tests."""

import numpy as np
import pytest

from setk_tpu.ops.jacobi import jacobi_eigh
from setk_tpu.ops.linalg import eigh


@pytest.mark.parametrize("n", [2, 3, 4, 6, 8])
def test_jacobi_matches_lapack(rng, n):
    x = rng.standard_normal((64, n, n)) + 1j * rng.standard_normal(
        (64, n, n))
    a = ((x + np.conj(np.swapaxes(x, -1, -2))) / 2).astype(np.complex64)
    w, v = jacobi_eigh(a, sweeps=10)
    w, v = np.asarray(w), np.asarray(v)
    np.testing.assert_allclose(w, np.linalg.eigvalsh(a), atol=2e-5,
                               rtol=1e-4)
    # eigen-equation residual and orthonormality
    res = np.einsum("bij,bjk->bik", a, v) - v * w[:, None, :]
    assert np.abs(res).max() < 1e-4
    gram = np.einsum("bij,bik->bjk", np.conj(v), v)
    assert np.abs(gram - np.eye(n)).max() < 1e-5


def test_jacobi_degenerate_spectra(rng):
    # repeated eigenvalues + near-zero matrices
    a = np.zeros((3, 4, 4), dtype=np.complex64)
    a[0] = np.eye(4) * 2.0  # fully degenerate
    a[1] = np.diag([1.0, 1.0, 2.0, 2.0])  # pairs
    a[2] = np.eye(4) * 1e-12  # tiny
    w, v = jacobi_eigh(a)
    w, v = np.asarray(w), np.asarray(v)
    res = np.einsum("bij,bjk->bik", a, v) - v * w[:, None, :]
    assert np.abs(res).max() < 1e-6
    assert np.isfinite(v).all()


def test_dispatcher_small_vs_large(rng):
    small = rng.standard_normal((5, 6, 6)).astype(np.float32)
    small = ((small + np.swapaxes(small, -1, -2)) / 2).astype(np.complex64)
    w, _ = eigh(small)
    np.testing.assert_allclose(np.asarray(w), np.linalg.eigvalsh(small),
                               atol=2e-5)
    big = rng.standard_normal((2, 16, 16))
    big = ((big + np.swapaxes(big, -1, -2)) / 2).astype(np.float32)
    w, _ = eigh(big)
    np.testing.assert_allclose(np.asarray(w), np.linalg.eigvalsh(big),
                               atol=1e-4)
