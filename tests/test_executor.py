"""Batch executor tests: bucketing, manifest sharding, mesh execution."""

import numpy as np

from setk_tpu.dsp import StftConfig, forward_stft
from setk_tpu.parallel import make_mesh
from setk_tpu.parallel.executor import (shard_manifest, LengthBucketer,
                                        BatchEnhancer)


def test_shard_manifest():
    keys = [f"u{i}" for i in range(10)]
    shards = [shard_manifest(keys, 3, i) for i in range(3)]
    assert sum(len(s) for s in shards) == 10
    assert sorted(sum(shards, [])) == sorted(keys)
    # deterministic
    assert shard_manifest(keys, 3, 1) == shards[1]


def test_bucketer():
    cfg = StftConfig()
    b = LengthBucketer(cfg, samples_per_bucket=16384)
    assert b.bucket(10) == 16384
    assert b.bucket(16384) == 16384
    assert b.bucket(16385) == 32768
    assert b.bucket(16384) % cfg.frame_hop == 0


def _utterance(rng, nsamps, n=4):
    cfg = StftConfig()
    clean = rng.standard_normal(nsamps).astype(np.float32) * 0.2
    wav = (np.stack([clean] * n) +
           rng.standard_normal((n, nsamps)).astype(np.float32) * 0.05)
    spec = np.asarray(forward_stft(wav[0], cfg))
    mask = (np.abs(spec) / (np.abs(spec) + 0.05)).astype(np.float32)
    return wav, mask, clean


def test_batch_enhancer_varied_lengths(rng):
    cfg = StftConfig()
    enh = BatchEnhancer(cfg, batch_size=2, samples_per_bucket=8192)
    results = {}
    lengths = [8000, 8192, 12000, 9000, 16384]
    cleans = {}
    for i, n in enumerate(lengths):
        wav, mask, clean = _utterance(rng, n)
        key = f"u{i}"
        cleans[key] = clean
        for k, out in enh.add(key, wav, mask):
            results[k] = out
    for k, out in enh.flush():
        results[k] = out
    assert set(results) == {f"u{i}" for i in range(len(lengths))}
    for i, n in enumerate(lengths):
        out = results[f"u{i}"]
        assert out.shape == (n,)
        # enhancement actually helps
        c = cleans[f"u{i}"]
        corr = np.corrcoef(out, c)[0, 1]
        assert corr > 0.9


def test_batch_enhancer_with_mesh(rng):
    cfg = StftConfig()
    mesh = make_mesh(8, axis_sizes=(8, 1, 1))
    enh = BatchEnhancer(cfg, batch_size=4, mesh=mesh,
                        samples_per_bucket=8192)
    results = {}
    for i in range(5):
        wav, mask, clean = _utterance(rng, 8000)
        for k, out in enh.add(f"u{i}", wav, mask):
            results[k] = out
    for k, out in enh.flush():
        results[k] = out
    assert len(results) == 5
    for out in results.values():
        assert np.isfinite(out).all()


def test_batch_wpe_matches_single(rng):
    """Bucketed batched WPE equals per-utterance WPE, including a
    shorter utterance that gets zero-padded inside its bucket."""
    import jax.numpy as jnp
    from setk_tpu.dsp import StftConfig, forward_stft, inverse_stft
    from setk_tpu.enhance.wpe import wpe
    from setk_tpu.parallel.executor import BatchWpe
    cfg = StftConfig()
    n, s = 3, 16384
    wavs = {
        "a": (rng.standard_normal((n, s)) * 0.2).astype(np.float32),
        "b": (rng.standard_normal((n, s)) * 0.2).astype(np.float32),
        "c": (rng.standard_normal((n, s - 3000)) * 0.2).astype(np.float32),
    }
    ex = BatchWpe(cfg, taps=4, delay=2, num_iters=2, batch_size=2)
    got = {}
    for k, w in wavs.items():
        for dk, out in ex.add(k, w):
            got[dk] = out
    for dk, out in ex.flush():
        got[dk] = out
    assert set(got) == set(wavs)
    for k, w in wavs.items():
        nsamps = w.shape[-1]
        bucket = ex.bucketer.bucket(nsamps)
        padded = np.zeros((n, bucket), np.float32)
        padded[:, :nsamps] = w
        spec = np.asarray(forward_stft(padded, cfg))  # (N, T, F)
        obs = spec.transpose(2, 0, 1).astype(np.complex64)
        der = wpe(obs, taps=4, delay=2, num_iters=2)
        ref = np.asarray(
            inverse_stft(jnp.transpose(der, (1, 2, 0)), cfg,
                         nsamps=nsamps))
        assert got[k].shape == (n, nsamps)
        scale = np.abs(ref).max()
        np.testing.assert_allclose(got[k], ref, atol=1e-4 * scale)


def test_batch_enhancer_int16(rng):
    """int16 wavs flow through the batch executor (the fused TPU kernels
    convert in VMEM; on CPU enhance_batch converts up front)."""
    from setk_tpu.dsp import StftConfig
    from setk_tpu.parallel.executor import BatchEnhancer
    cfg = StftConfig()
    n, s = 3, 8192
    ex = BatchEnhancer(cfg, batch_size=2, samples_per_bucket=8192)
    t = (s // cfg.frame_hop) + 1
    outs = {}
    for key in ("a", "b"):
        w16 = (rng.standard_normal((n, s)) * 3000).astype(np.int16)
        mask = rng.random((t, cfg.num_bins)).astype(np.float32)
        for k, o in ex.add(key, w16, mask):
            outs[k] = o
    for k, o in ex.flush():
        outs[k] = o
    assert set(outs) == {"a", "b"}
    for o in outs.values():
        assert o.dtype == np.float32 and np.isfinite(o).all()
        assert np.abs(o).max() < 10.0  # normalized scale out


def test_batch_enhancer_online_chunked(rng):
    """Batched online (EMA-chunked) beamforming equals the
    single-utterance online path on the same padded shapes."""
    import jax.numpy as jnp
    from setk_tpu.dsp import StftConfig, forward_stft, inverse_stft
    from setk_tpu.enhance import beamformer as bf
    from setk_tpu.parallel.executor import BatchEnhancer
    cfg = StftConfig()
    n, s = 3, 16384
    chunk = 16
    ex = BatchEnhancer(cfg, batch_size=2, samples_per_bucket=16384,
                       chunk_size=chunk, alpha=0.7)
    wavs = {k: (rng.standard_normal((n, s)) * 0.2).astype(np.float32)
            for k in ("a", "b")}
    t = cfg.num_frames(s)
    masks = {k: rng.random((t, cfg.num_bins)).astype(np.float32)
             for k in wavs}
    got = {}
    for k in wavs:
        for dk, out in ex.add(k, wavs[k], masks[k]):
            got[dk] = out
    for dk, out in ex.flush():
        got[dk] = out
    assert set(got) == set(wavs)
    for k, w in wavs.items():
        spec = forward_stft(jnp.asarray(w), cfg)          # (N, T, F)
        obs = jnp.transpose(spec, (2, 0, 1))              # (F, N, T)
        mk = jnp.asarray(masks[k]).T                      # (F, T)
        tf = obs.shape[-1]
        # pad frames carry mask_n = 0 (not 1 - 0) so they drop out of
        # both covariance denominators — matching enhance_batch
        mn = 1.0 - mk
        pad = (-tf) % chunk
        if pad:
            obs = jnp.pad(obs, ((0, 0), (0, 0), (0, pad)))
            mk = jnp.pad(mk, ((0, 0), (0, pad)))
            mn = jnp.pad(mn, ((0, 0), (0, pad)))
        enh = bf.online_supervised_run("mvdr", obs, mk, mask_n=mn,
                                       chunk_size=chunk,
                                       alpha=0.7)[..., :tf]
        ref = np.asarray(inverse_stft(jnp.swapaxes(enh, -1, -2), cfg,
                                      nsamps=s))
        scale = np.abs(ref).max()
        np.testing.assert_allclose(got[k], ref, atol=1e-4 * scale)


def test_batch_enhancer_mixed_dtype_bucket(rng):
    """A bucket mixing int16 and float32 items rescales the int16 ones
    (the batch array goes float32, so raw int16 values would be ~32768x
    too loud)."""
    from setk_tpu.dsp import StftConfig
    from setk_tpu.parallel.executor import BatchEnhancer
    cfg = StftConfig()
    n, s = 3, 8192
    t = (s // cfg.frame_hop) + 1
    wf = (rng.standard_normal((n, s)) * 0.09).astype(np.float32)
    w16 = (wf * 32768.0).astype(np.int16)
    mask = rng.random((t, cfg.num_bins)).astype(np.float32)

    mixed = BatchEnhancer(cfg, batch_size=2, samples_per_bucket=8192)
    got = dict(mixed.add("f32", wf, mask) + mixed.add("i16", w16, mask) +
               mixed.flush())
    assert set(got) == {"f32", "i16"}
    # the int16 output must land at float32 scale, not 32768x louder
    ref = dict(BatchEnhancer(cfg, batch_size=1,
                             samples_per_bucket=8192).add("i16", w16, mask))
    scale = np.abs(ref["i16"]).max()
    np.testing.assert_allclose(got["i16"], ref["i16"], atol=1e-4 * scale)
