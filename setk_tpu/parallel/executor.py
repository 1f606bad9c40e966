"""Batched, bucketed, data-parallel utterance execution.

The reference scales by splitting .scp manifests into N shards and
launching N processes (utils/split_scp.pl + run.pl/queue.pl — SURVEY.md
§2.3).  The TPU-native equivalent:

  * ``shard_manifest`` — deterministic manifest sharding across hosts
    (each process handles its own shard; multi-host via jax.distributed).
  * ``LengthBucketer`` — group utterances into padded shape buckets so a
    handful of compiled programs serve the whole corpus.
  * ``BatchEnhancer`` — assemble (B, N, S) batches + (B, T, F) masks,
    run the jitted enhancement pipeline per bucket, data-parallel over
    the mesh's ``data`` axis via NamedSharding, and return per-utterance
    trimmed waveforms.
"""

from collections import defaultdict
from functools import lru_cache

import numpy as np

from setk_tpu.dsp.stft import StftConfig, num_frames
from setk_tpu.utils.logger import get_logger

logger = get_logger(__name__)

__all__ = ["shard_manifest", "LengthBucketer", "BatchEnhancer",
           "BatchClusterer", "BatchWpe"]


def shard_manifest(keys, num_shards: int, shard_index: int):
    """Deterministic contiguous sharding of a key list (split_scp.pl)."""
    if not 0 <= shard_index < num_shards:
        raise ValueError(f"Bad shard {shard_index}/{num_shards}")
    keys = list(keys)
    base, extra = divmod(len(keys), num_shards)
    beg = shard_index * base + min(shard_index, extra)
    end = beg + base + (1 if shard_index < extra else 0)
    return keys[beg:end]


class LengthBucketer:
    """Round sample lengths up to hop-aligned buckets."""

    def __init__(self, cfg: StftConfig, samples_per_bucket: int = 16384):
        self.cfg = cfg
        self.step = samples_per_bucket

    def bucket(self, nsamps: int) -> int:
        b = -(-nsamps // self.step) * self.step
        # keep hop alignment so padded frames are complete
        hop = self.cfg.frame_hop
        return -(-b // hop) * hop


class BatchEnhancer:
    """Mask-based beamforming over batches of utterances.

    Feed (key, wav (N, S), mask (T, F)) triples; batches of equal bucket
    shape are flushed through one jitted program.  With a Mesh, inputs
    are sharded over the ``data`` axis (pure data parallelism — the jit
    partitioner keeps everything local per shard).
    """

    def __init__(self,
                 cfg: StftConfig,
                 beamformer: str = "mvdr",
                 batch_size: int = 8,
                 mesh=None,
                 ban: bool = False,
                 samples_per_bucket: int = 16384,
                 chunk_size: int = -1,
                 alpha: float = 0.8):
        self.cfg = cfg
        self.beamformer = beamformer
        self.batch_size = batch_size
        self.mesh = mesh
        self.ban = ban
        self.chunk_size = chunk_size
        self.alpha = alpha
        self.bucketer = LengthBucketer(cfg, samples_per_bucket)
        self._pending = defaultdict(list)

    @lru_cache(maxsize=None)
    def _fn(self, nsamps):
        import jax
        from setk_tpu.parallel.enhance_step import enhance_batch

        def fn(wav, mask):
            return enhance_batch(wav, mask, self.cfg,
                                 beamformer=self.beamformer, ban=self.ban,
                                 nsamps=nsamps, chunk_size=self.chunk_size,
                                 alpha=self.alpha)

        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            sharding = NamedSharding(self.mesh, P("data"))
            return jax.jit(fn, in_shardings=(sharding, sharding),
                           out_shardings=sharding)
        return jax.jit(fn)

    def _data_multiple(self):
        if self.mesh is None:
            return 1
        return int(self.mesh.shape.get("data", 1))

    def add(self, key, wav: np.ndarray, mask: np.ndarray):
        """Queue one utterance; returns flushed results (possibly [])."""
        n_ch, nsamps = wav.shape
        bucket = self.bucketer.bucket(nsamps)
        self._pending[(n_ch, bucket)].append((key, wav, mask))
        if len(self._pending[(n_ch, bucket)]) >= self.batch_size:
            return self._flush_bucket((n_ch, bucket))
        return []

    def flush(self):
        """Flush all remaining partial batches."""
        out = []
        for shape in list(self._pending):
            out.extend(self._flush_bucket(shape))
        return out

    def _flush_bucket(self, shape):
        import jax
        items = self._pending.pop(shape, [])
        if not items:
            return []
        n_ch, bucket = shape
        t_pad = num_frames(bucket, self.cfg)
        f_bins = self.cfg.num_bins
        batch = len(items)
        # pad batch to a multiple of the data axis; int16 wavs stay
        # int16 (the fused TPU kernels convert in VMEM — see
        # enhance/pipeline.mvdr_enhance_fused)
        mult = self._data_multiple()
        full = -(-batch // mult) * mult
        wav_dt = (np.int16 if all(w.dtype == np.int16 for _, w, _ in items)
                  else np.float32)
        wavs = np.zeros((full, n_ch, bucket), dtype=wav_dt)
        masks = np.zeros((full, t_pad, f_bins), dtype=np.float32)
        lengths = []
        for i, (key, wav, mask) in enumerate(items):
            s = wav.shape[-1]
            if wav_dt == np.float32 and wav.dtype == np.int16:
                # mixed-dtype bucket: the batch went float32, so int16
                # items must be rescaled here (enhance_batch only
                # rescales when the whole batch array is int16)
                wavs[i, :, :s] = wav.astype(np.float32) / 32768.0
            else:
                wavs[i, :, :s] = wav
            t = min(mask.shape[0], t_pad)
            masks[i, :t, :] = mask[:t]
            lengths.append((key, s))
        out = np.asarray(self._fn(bucket)(wavs, masks))
        return [(key, out[i, :s]) for i, (key, s) in enumerate(lengths)]


class BatchClusterer:
    """Batched CGMM/CACGMM mask estimation over utterance buckets.

    The reference runs EM one utterance at a time on one core; here B
    utterances of a common frame bucket run as one jitted EM program
    (frame-masked statistics keep padded frames out of the updates) —
    the clustering analog of BatchEnhancer.
    """

    def __init__(self, algo: str = "cacgmm", num_classes: int = 2,
                 num_iters: int = 20, batch_size: int = 16,
                 frame_bucket: int = 128, seed: int = 0, **em_kwargs):
        # batch_size default raised 4 -> 16 in round 4: the fused EM's
        # kernel-side cost per utterance falls 0.85 -> 0.64 -> 0.49 ms
        # at B = 4 / 8 / 32 (BENCH_LATENCY_r04 — lane padding at 257
        # bins amortizes with batch), unlike the beamformer family
        # which is flat from B=8
        if algo not in ("cgmm", "cacgmm"):
            raise ValueError(f"Unknown clustering algo: {algo}")
        self.algo = algo
        self.num_classes = num_classes
        self.num_iters = num_iters
        self.batch_size = batch_size
        self.frame_bucket = frame_bucket
        self.seed = seed
        self.em_kwargs = em_kwargs
        self._pending = defaultdict(list)

    def add(self, key, obs: np.ndarray):
        """Queue one utterance's STFT (F, M, T); returns flushed results."""
        f, m, t = obs.shape
        bucket = -(-t // self.frame_bucket) * self.frame_bucket
        self._pending[(f, m, bucket)].append((key, obs))
        if len(self._pending[(f, m, bucket)]) >= self.batch_size:
            return self._flush_bucket((f, m, bucket))
        return []

    def flush(self):
        out = []
        for shape in list(self._pending):
            out.extend(self._flush_bucket(shape))
        return out

    def _flush_bucket(self, shape):
        import jax
        from setk_tpu.enhance.cluster import cgmm_em, cacgmm_em
        items = self._pending.pop(shape, [])
        if not items:
            return []
        f, m, bucket = shape
        batch = len(items)
        obs = np.zeros((batch, f, m, bucket), dtype=np.complex64)
        fmask = np.zeros((batch, 1, bucket), dtype=np.float32)
        lengths = []
        for i, (key, o) in enumerate(items):
            t = o.shape[-1]
            obs[i, :, :, :t] = o
            # padded bins carry tiny noise so normalized observations
            # stay finite; the frame mask removes them from statistics
            obs[i, :, :, t:] = 1e-6
            fmask[i, 0, :t] = 1.0
            lengths.append((key, t))
        em = cgmm_em if self.algo == "cgmm" else cacgmm_em
        from setk_tpu.utils.hostdev import put_complex
        gamma, _ = em(put_complex(obs), self.num_classes,
                      num_iters=self.num_iters, frame_mask=fmask,
                      key=jax.random.PRNGKey(self.seed), **self.em_kwargs)
        gamma = np.asarray(gamma)  # (K, B, F, bucket)
        return [(key, gamma[:, i, :, :t]) for i, (key, t) in
                enumerate(lengths)]


class BatchWpe:
    """Batched WPE dereverberation over utterance buckets.

    The reference loops utterances through the NumPy WPE one at a time
    (/root/reference/scripts/sptk/apply_wpe.py); here B same-bucket
    utterances run as one jitted STFT -> GWPE -> iSTFT program,
    optionally data-parallel over the mesh ``data`` axis.  Zero-padded
    tails are harmless: the floored lambda keeps their taps at zero
    weight (enhance/wpe.py).
    """

    def __init__(self,
                 cfg: StftConfig,
                 taps: int = 10,
                 delay: int = 3,
                 context: int = 1,
                 num_iters: int = 3,
                 batch_size: int = 8,
                 mesh=None,
                 samples_per_bucket: int = 16384):
        self.cfg = cfg
        self.taps = taps
        self.delay = delay
        self.context = context
        self.num_iters = num_iters
        self.batch_size = batch_size
        self.mesh = mesh
        self.bucketer = LengthBucketer(cfg, samples_per_bucket)
        self._pending = defaultdict(list)

    @lru_cache(maxsize=None)
    def _fn(self, nsamps):
        import jax
        import jax.numpy as jnp
        from setk_tpu.dsp.stft import forward_stft, inverse_stft
        from setk_tpu.enhance.wpe import wpe

        def fn(wav):
            spec = forward_stft(wav, self.cfg)  # (B, N, T, F)
            obs = jnp.transpose(spec, (0, 3, 1, 2))  # (B, F, N, T)
            der = wpe(obs, taps=self.taps, delay=self.delay,
                      context=self.context, num_iters=self.num_iters)
            return inverse_stft(jnp.transpose(der, (0, 2, 3, 1)),
                                self.cfg, nsamps=nsamps)  # (B, N, S)

        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            sharding = NamedSharding(self.mesh, P("data"))
            return jax.jit(fn, in_shardings=(sharding,),
                           out_shardings=sharding)
        return jax.jit(fn)

    def _data_multiple(self):
        if self.mesh is None:
            return 1
        return int(self.mesh.shape.get("data", 1))

    def add(self, key, wav: np.ndarray):
        """Queue one utterance (N, S); returns flushed (key, (N, S))."""
        n_ch, nsamps = wav.shape
        bucket = self.bucketer.bucket(nsamps)
        self._pending[(n_ch, bucket)].append((key, wav))
        if len(self._pending[(n_ch, bucket)]) >= self.batch_size:
            return self._flush_bucket((n_ch, bucket))
        return []

    def flush(self):
        out = []
        for shape in list(self._pending):
            out.extend(self._flush_bucket(shape))
        return out

    def _flush_bucket(self, shape):
        items = self._pending.pop(shape, [])
        if not items:
            return []
        n_ch, bucket = shape
        batch = len(items)
        mult = self._data_multiple()
        full = -(-batch // mult) * mult
        wavs = np.zeros((full, n_ch, bucket), dtype=np.float32)
        lengths = []
        for i, (key, wav) in enumerate(items):
            s = wav.shape[-1]
            wavs[i, :, :s] = wav
            lengths.append((key, s))
        out = np.asarray(self._fn(bucket)(wavs))
        return [(key, out[i, :, :s]) for i, (key, s) in enumerate(lengths)]
