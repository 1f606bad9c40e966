"""AuxIVA parity + VAD behavior tests."""

import numpy as np

import reference_oracle as ro

from setk_tpu.enhance.auxiva import auxiva
from setk_tpu.enhance.vad import (energy_frame_vad, VoiceSplitter,
                                  remove_silence, vad_masks)


def _ref_auxiva(X, epochs):
    """The reference auxiva() body, via oracle import of the CLI module."""
    import importlib.util
    import sys
    sys.path.insert(0, "/root/reference/scripts/sptk")  # for its `libs.` imports
    spec = importlib.util.spec_from_file_location(
        "ref_auxiva_cli", "/root/reference/scripts/sptk/apply_auxiva.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.auxiva(X, epochs=epochs)


def test_auxiva_parity(rng):
    n, t, f = 2, 40, 9
    mix = (rng.standard_normal((n, t, f)) +
           1j * rng.standard_normal((n, t, f)))
    ref = _ref_auxiva(mix.copy(), 5)
    ours = np.asarray(auxiva(mix.astype(np.complex64), epochs=5))
    np.testing.assert_allclose(ours, ref, atol=5e-2, rtol=5e-2)


def test_auxiva_separates(rng):
    """Instantaneous 2x2 mixture: outputs should be closer to sources."""
    t, f = 200, 17
    s = rng.laplace(size=(2, t, f)) + 1j * rng.laplace(size=(2, t, f))
    a = np.array([[1.0, 0.6], [0.4, 1.0]])
    mix = np.einsum("nm,mtf->ntf", a, s)
    y = np.asarray(auxiva(mix.astype(np.complex64), epochs=30))

    def corr(x1, x2):
        num = np.abs(np.vdot(x1, x2))
        return num / (np.linalg.norm(x1) * np.linalg.norm(x2))

    # each output should be dominated by one source (permutation allowed)
    c = np.array([[corr(y[i], s[j]) for j in range(2)] for i in range(2)])
    assert max(c[0, 0] * c[1, 1], c[0, 1] * c[1, 0]) > 0.5 * (
        c.max()**2), c
    best = max(min(c[0, 0], c[1, 1]), min(c[0, 1], c[1, 0]))
    assert best > 0.8


def test_energy_vad_detects_bursts(rng):
    sr = 16000
    sil = rng.standard_normal(sr) * 0.001
    speech = rng.standard_normal(sr) * 0.5
    samps = np.concatenate([sil, speech, sil]).astype(np.float32)
    active = np.asarray(energy_frame_vad(samps, 320))
    mid = active[50:100]
    edge = np.concatenate([active[:45], active[105:]])
    assert mid.mean() > 0.9
    assert edge.mean() < 0.2


def test_voice_splitter_hangover():
    vs = VoiceSplitter(3)
    pattern = [0] * 5 + [1] * 10 + [0] * 10 + [1] * 2 + [0] * 5
    for a in pattern:
        vs.run(bool(a))
    segs = vs.report(voice=True)
    assert len(segs) == 1
    beg, end = segs[0]
    # opens after 3 consecutive active (backdated), closes after 3 inactive
    assert beg == 5 - 1 + 3 - 3 + 1 or beg in (4, 5)
    assert 17 <= end <= 19


def test_remove_silence(rng):
    sr = 16000
    sil = rng.standard_normal(sr) * 0.001
    speech = rng.standard_normal(sr) * 0.5
    samps = np.concatenate([sil, speech, sil]).astype(np.float32)
    voiced, segs = remove_silence(samps, sr=sr)
    assert len(segs) >= 1
    assert 0.8 * sr < voiced.shape[-1] < 1.6 * sr


def test_vad_masks_parity(rng):
    """Against an inline transcription of the reference host loop."""
    f, t = 33, 20
    spec = rng.standard_normal((f, t)) + 1j * rng.standard_normal((f, t))
    proportion = 0.8
    silence, idx = vad_masks(spec, proportion)
    silence = np.asarray(silence)
    # reference loop
    energy = np.abs(spec)
    vec = np.sort(energy.flatten())
    filter_energy = vec.sum() * (1 - proportion)
    cumsum, index = 0, 0
    threshold = 0
    while index < vec.shape[0]:
        threshold = vec[index]
        cumsum += threshold
        if cumsum > filter_energy:
            break
        index += 1
    ref = (energy < threshold).T
    np.testing.assert_array_equal(silence, ref)
    assert int(idx) == index


def test_gmm_vad_detects_bursts(rng):
    from setk_tpu.enhance.vad import gmm_frame_vad
    sr = 16000
    sil = rng.standard_normal(sr) * 0.001
    # speech-like: modulated band-limited burst (energy in 250-2k Hz)
    tt = np.arange(sr) / sr
    carrier = np.sin(2 * np.pi * 700 * tt) + np.sin(2 * np.pi * 1300 * tt)
    speech = (carrier * (0.6 + 0.4 * np.sin(2 * np.pi * 4 * tt)) * 0.4
              + rng.standard_normal(sr) * 0.05)
    samps = np.concatenate([sil, speech, sil]).astype(np.float32)
    active = np.asarray(gmm_frame_vad(samps, 320, sr=sr, mode=1))
    assert active[50:100].mean() > 0.8
    assert np.concatenate([active[:45], active[105:]]).mean() < 0.3


def test_gmm_vad_batched_matches_single(rng):
    """Leading batch dims are preserved and match per-utterance calls."""
    from setk_tpu.enhance.vad import gmm_frame_vad
    sr = 16000
    tt = np.arange(sr) / sr
    a = (np.sin(2 * np.pi * 800 * tt) * 0.4
         + rng.standard_normal(sr) * 0.05).astype(np.float32)
    b = (rng.standard_normal(sr) * 0.01).astype(np.float32)
    batch = np.stack([a, b])
    out = np.asarray(gmm_frame_vad(batch, 320, sr=sr, mode=1))
    assert out.shape == (2, sr // 320)
    for i, sig in enumerate((a, b)):
        single = np.asarray(gmm_frame_vad(sig, 320, sr=sr, mode=1))
        assert np.array_equal(out[i], single)


def test_gmm_vad_mode_monotonic(rng):
    """Higher aggressiveness must not mark MORE frames active."""
    from setk_tpu.enhance.vad import gmm_frame_vad
    sr = 16000
    tt = np.arange(2 * sr) / sr
    sig = (np.sin(2 * np.pi * 900 * tt) *
           (np.sin(2 * np.pi * 3 * tt) > 0) * 0.3
           + rng.standard_normal(2 * sr) * 0.02).astype(np.float32)
    counts = [int(np.asarray(gmm_frame_vad(sig, 320, sr=sr, mode=m)).sum())
              for m in (0, 1, 2, 3)]
    # decisions feed back into model adaptation, so strict monotonicity
    # is not structurally guaranteed frame by frame — allow small slack
    for m in range(3):
        assert counts[m + 1] <= counts[m] + 2, counts
    assert counts[0] > counts[3]
    assert counts[0] > 0


def test_remove_silence_gmm_backend(rng):
    sr = 16000
    sil = rng.standard_normal(sr) * 0.001
    tt = np.arange(sr) / sr
    speech = (np.sin(2 * np.pi * 800 * tt) * 0.4
              + rng.standard_normal(sr) * 0.05)
    samps = np.concatenate([sil, speech, sil]).astype(np.float32)
    voiced, segs = remove_silence(samps, sr=sr, backend="gmm", mode=1)
    assert len(segs) >= 1
    assert 0.7 * sr < voiced.shape[-1] < 1.8 * sr
