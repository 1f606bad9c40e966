"""Simulation subsystem tests: RIR engines (cross-validated), mixer, rooms."""

import json

import numpy as np
import pytest

from setk_tpu.sim.rir import (rir_generate_native, rir_generate_jax,
                              beta_from_t60, t60_from_beta)
from setk_tpu.sim.mixer import (coeff_snr, fft_convolve, add_room_response,
                                simulate)
from setk_tpu.sim.room import Room, RoomGenerator, RirSimulator

ROOM = [5.0, 4.0, 3.0]
SRC = [2.0, 3.0, 1.5]
MICS = [[2.0, 1.5, 1.0], [2.06, 1.5, 1.0]]


def test_beta_t60_roundtrip():
    beta = beta_from_t60(ROOM, 0.4)
    assert beta.shape == (6,)
    assert abs(t60_from_beta(ROOM, beta) - 0.4) < 1e-6
    with pytest.raises(ValueError):
        beta_from_t60([8.0, 8.0, 4.0], 0.05)  # too short for this room


def test_engines_agree():
    rn = rir_generate_native(ROOM, SRC, MICS, sr=16000, t60=0.25)
    rj = np.asarray(rir_generate_jax(ROOM, SRC, MICS, sr=16000, t60=0.25))
    assert rn.shape == rj.shape == (2, 4000)
    rel = np.abs(rn - rj).max() / np.abs(rn).max()
    assert rel < 1e-3


def test_engines_agree_order_and_pattern():
    rn = rir_generate_native(ROOM, SRC, MICS, sr=16000, t60=0.25, order=2,
                             mic_type="cardioid", angle=(0.5, 0.1),
                             hp_filter=False)
    rj = np.asarray(
        rir_generate_jax(ROOM, SRC, MICS, sr=16000, t60=0.25, order=2,
                         mic_type="cardioid", angle=(0.5, 0.1),
                         hp_filter=False))
    rel = np.abs(rn - rj).max() / np.abs(rn).max()
    assert rel < 1e-3


def test_rir_physics():
    rir = rir_generate_native(ROOM, SRC, MICS, sr=16000, t60=0.3,
                              hp_filter=False)
    # direct path arrives at dist/c * sr samples
    dist = np.linalg.norm(np.array(SRC) - np.array(MICS[0]))
    expected = dist / 340.0 * 16000
    peak = np.abs(rir[0]).argmax()
    assert abs(peak - expected) < 3
    # energy decays: second half much weaker than around the peak
    early = np.sum(rir[0][:2400]**2)
    late = np.sum(rir[0][2400:]**2)
    assert late < 0.2 * early


def test_fft_convolve_matches_scipy(rng):
    import scipy.signal as ss
    sig = rng.standard_normal(2000).astype(np.float32)
    ker = rng.standard_normal((3, 301)).astype(np.float32)
    ref = ss.convolve(sig[None, :], ker)[..., :2000]
    ours = fft_convolve(sig[None, :], ker)
    np.testing.assert_allclose(ours, ref, atol=1e-2, rtol=1e-3)


def test_coeff_snr():
    # alpha scaling achieves the requested SNR
    pa, pb, snr = 1.0, 4.0, 10.0
    alpha = coeff_snr(pb, pa, snr)
    achieved = 10 * np.log10(pa / (pb * alpha**2))
    assert abs(achieved - snr) < 0.01


def test_simulate_end_to_end(rng):
    sr = 16000
    spk1 = rng.standard_normal(sr).astype(np.float32) * 0.3
    spk2 = rng.standard_normal(sr).astype(np.float32) * 0.3
    rirs = rir_generate_native(ROOM, SRC, MICS, sr=sr, t60=0.2)
    rir2 = rir_generate_native(ROOM, [3.0, 2.0, 1.5], MICS, sr=sr, t60=0.2)
    noise = rng.standard_normal(sr).astype(np.float32)
    mix, refs, nref = simulate([spk1, spk2],
                               sdr=[5.0],
                               src_rir=[rirs, rir2],
                               point_noise=[noise],
                               point_noise_snr=[10.0],
                               point_noise_rir=[rir2],
                               norm_factor=0.9)
    assert mix.shape == (2, sr)
    assert abs(np.abs(mix).max() - 0.9) < 1e-3
    assert len(refs) == 2 and refs[0].shape == (sr,)
    assert nref is not None and nref.shape == (sr,)


def test_room_generator_and_simulator(tmp_path):
    import random as _random
    gen = RoomGenerator(rt60_range="0.2,0.5", room_dim="4,6;4,6;2.5,3",
                        rng=_random.Random(5))
    room = None
    while room is None:
        room = gen.generate()
    # sampled in [rt60_min(room), 0.5] — the Sabine-feasible range
    assert 0 < room.rt60 <= 0.5

    sim = RirSimulator(str(tmp_path / "rirs"),
                       array_topo=(0.0, 0.05, 0.1),
                       geometry="linear",
                       room_dim="4,5;4,5;2.5,3",
                       rt60="0.2,0.4",
                       num_rooms=1,
                       num_rirs=2,
                       rir_dur=0.2,
                       seed=3)
    done = sim.run()
    assert done == 1
    cfg = json.loads((tmp_path / "rirs" / "rir.json").read_text())
    assert len(cfg) == 1
    assert len(cfg[0]["spk"]) == 2
    from setk_tpu.io.wave import read_wav
    rir = read_wav(cfg[0]["spk"][0]["loc"], sr=16000)
    assert rir.shape == (3, 3200)
