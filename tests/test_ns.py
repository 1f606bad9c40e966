"""OM-LSA (MCRA/iMCRA) parity tests against the reference recursions."""

import numpy as np
import pytest

import reference_oracle as ro

from setk_tpu.enhance.ns import mcra_gain, imcra_gain, MCRAConfig, IMCRAConfig


def _noisy_stft(rng, t=50, f=33):
    """Speech-like bursts + stationary noise."""
    noise = (rng.standard_normal((t, f)) +
             1j * rng.standard_normal((t, f))) * 0.3
    speech = np.zeros((t, f), dtype=complex)
    speech[10:30] = (rng.standard_normal((20, f)) +
                     1j * rng.standard_normal((20, f))) * 2.0
    return speech + noise


def test_mcra_parity(rng):
    stft = _noisy_stft(rng)
    ref = ro.ref_ns.MCRA(M=32).run(stft)
    ours = np.asarray(mcra_gain(stft.astype(np.complex64), MCRAConfig(M=32)))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-2, rtol=2e-2)


def test_imcra_parity(rng):
    stft = _noisy_stft(rng, t=64)
    ref = ro.ref_ns.iMCRA().run(stft)
    ours = np.asarray(imcra_gain(stft.astype(np.complex64)))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-2, rtol=2e-2)


def test_gain_suppresses_noise_frames(rng):
    stft = _noisy_stft(rng, t=80)
    gain = np.asarray(imcra_gain(stft.astype(np.complex64)))
    assert (gain >= 0).all() and (gain <= 1 + 1e-4).all()
    # later pure-noise frames should be strongly suppressed vs speech burst
    noise_gain = gain[60:].mean()
    speech_gain = gain[12:28].mean()
    assert noise_gain < speech_gain
