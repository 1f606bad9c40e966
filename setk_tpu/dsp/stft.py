"""Batched STFT / iSTFT in pure JAX with librosa-0.8.1 semantics.

The reference toolkit's active Python path wraps librosa
(/root/reference/scripts/sptk/libs/utils.py:96-173): window of length
``frame_len`` center-padded to ``n_fft`` (= next pow2 of frame_len when
round_power_of_two), optional reflect center-padding of the signal by
n_fft//2, frames of length n_fft every ``frame_hop`` samples, rFFT; the
inverse applies the window to each irFFT frame, overlap-adds, and divides by
the squared-window envelope where it is nonzero.

Unlike the reference (one mono utterance at a time), every function here is
batched over arbitrary leading axes and jit/vmap/shard_map friendly: static
shapes, no Python control flow on traced values.  Canonical complex layout is
``(..., T, F)`` (time-major, matching the reference CLIs' transpose=True
convention).
"""

from dataclasses import dataclass
from functools import cached_property, partial

import jax
import jax.numpy as jnp
import numpy as np

from setk_tpu.utils.common import EPSILON, nextpow2
from setk_tpu.dsp.window import make_window, pad_center, window_sumsquare

__all__ = [
    "StftConfig", "num_frames", "frame_signal", "forward_stft",
    "inverse_stft", "overlap_add"
]

# librosa.util.tiny(float32 array)
_TINY = float(np.finfo(np.float32).tiny)


@dataclass(frozen=True)
class StftConfig:
    """STFT parameterization, mirroring the toolkit-wide flag set
    (/root/reference/scripts/sptk/libs/opts.py:21-49)."""
    frame_len: int = 512
    frame_hop: int = 256
    window: str = "hann"
    center: bool = True
    round_power_of_two: bool = True

    @property
    def n_fft(self) -> int:
        return nextpow2(self.frame_len) if self.round_power_of_two \
            else self.frame_len

    @property
    def num_bins(self) -> int:
        return self.n_fft // 2 + 1

    @cached_property
    def padded_window(self) -> np.ndarray:
        """Analysis window of length frame_len, center-padded to n_fft."""
        return pad_center(make_window(self.window, self.frame_len), self.n_fft)

    def num_frames(self, num_samples: int) -> int:
        return num_frames(num_samples, self)


def num_frames(num_samples: int, cfg: StftConfig) -> int:
    """Frame count the forward transform produces for this many samples."""
    n_fft, hop = cfg.n_fft, cfg.frame_hop
    if cfg.center:
        num_samples = num_samples + 2 * (n_fft // 2)
    if num_samples < n_fft:
        raise ValueError(
            f"num_samples {num_samples} too short for n_fft {n_fft}")
    return 1 + (num_samples - n_fft) // hop


def num_samples(n_frames: int, cfg: StftConfig) -> int:
    """Sample count the inverse transform produces (before length trim)."""
    n_fft, hop = cfg.n_fft, cfg.frame_hop
    total = n_fft + hop * (n_frames - 1)
    if cfg.center:
        total -= 2 * (n_fft // 2)
    return total


def frame_signal(samps: jax.Array, cfg: StftConfig) -> jax.Array:
    """Slice ``(..., S)`` samples into ``(..., T, n_fft)`` frames.

    Applies the center reflect-padding but NOT the window.
    """
    n_fft, hop = cfg.n_fft, cfg.frame_hop
    if cfg.center:
        pad = [(0, 0)] * (samps.ndim - 1) + [(n_fft // 2, n_fft // 2)]
        samps = jnp.pad(samps, pad, mode="reflect")
    n_samps = samps.shape[-1]
    n_frames = 1 + (n_samps - n_fft) // hop
    # (T, n_fft) gather index; static under jit
    idx = (np.arange(n_frames)[:, None] * hop +
           np.arange(n_fft)[None, :])
    return samps[..., idx]


def forward_stft(samps: jax.Array,
                 cfg: StftConfig,
                 apply_abs: bool = False,
                 apply_log: bool = False,
                 apply_pow: bool = False) -> jax.Array:
    """STFT of ``(..., S)`` real samples -> ``(..., T, F)`` complex64.

    Post-ops mirror the reference wrapper
    (/root/reference/scripts/sptk/libs/utils.py:96-138).
    """
    if apply_log:
        apply_abs = True
    window = jnp.asarray(cfg.padded_window, dtype=samps.dtype)
    frames = frame_signal(samps, cfg) * window
    spec = jnp.fft.rfft(frames, n=cfg.n_fft, axis=-1)
    if apply_abs:
        spec = jnp.abs(spec)
    if apply_pow:
        spec = spec**2
    if apply_log:
        spec = jnp.log(jnp.maximum(spec, EPSILON))
    return spec


def overlap_add(frames: jax.Array, frame_hop: int) -> jax.Array:
    """Overlap-add ``(..., T, L)`` frames at the given hop -> ``(..., S)``.

    When L is a multiple of the hop this is done with R = L//hop shifted
    dense adds (no scatter): each frame splits into R hop-sized chunks and
    output chunk j accumulates frames[j - r, r] — a layout XLA vectorizes
    well on TPU.  Falls back to a scatter-add otherwise.
    """
    *batch, n_frames, frame_len = frames.shape
    total = frame_len + frame_hop * (n_frames - 1)
    if frame_len % frame_hop == 0:
        ratio = frame_len // frame_hop
        chunks = frames.reshape(*batch, n_frames, ratio, frame_hop)
        out = jnp.zeros((*batch, n_frames + ratio - 1, frame_hop),
                        dtype=frames.dtype)
        for r in range(ratio):
            out = out.at[..., r:r + n_frames, :].add(chunks[..., :, r, :])
        return out.reshape(*batch, total)
    # general fallback: scatter add
    idx = (np.arange(n_frames)[:, None] * frame_hop +
           np.arange(frame_len)[None, :]).reshape(-1)
    flat = frames.reshape(*batch, n_frames * frame_len)
    out = jnp.zeros((*batch, total), dtype=frames.dtype)
    return out.at[..., idx].add(flat)


def inverse_stft(stft_mat: jax.Array,
                 cfg: StftConfig,
                 nsamps: int | None = None,
                 norm: float | None = None,
                 power: float | None = None) -> jax.Array:
    """iSTFT of ``(..., T, F)`` complex -> ``(..., S)`` real samples.

    ``norm``/``power`` renormalize the output amplitude/power like the
    reference (/root/reference/scripts/sptk/libs/utils.py:142-173).
    ``nsamps`` trims or zero-pads to an exact length.
    """
    n_fft, hop = cfg.n_fft, cfg.frame_hop
    n_frames = stft_mat.shape[-2]
    window = cfg.padded_window
    frames = jnp.fft.irfft(stft_mat, n=n_fft, axis=-1)
    frames = frames * jnp.asarray(window, dtype=frames.dtype)
    samps = overlap_add(frames, hop)
    # squared-window envelope (host constant), guarded division
    wss = window_sumsquare(window, n_frames, hop, n_fft)
    wss_j = jnp.asarray(wss, dtype=samps.dtype)
    samps = jnp.where(wss_j > _TINY, samps / jnp.maximum(wss_j, _TINY), samps)
    if cfg.center:
        half = n_fft // 2
        samps = samps[..., half:samps.shape[-1] - half]
    if nsamps is not None:
        cur = samps.shape[-1]
        if nsamps <= cur:
            samps = samps[..., :nsamps]
        else:
            pad = [(0, 0)] * (samps.ndim - 1) + [(0, nsamps - cur)]
            samps = jnp.pad(samps, pad)
    if norm is not None:
        peak = jnp.max(jnp.abs(samps), axis=-1, keepdims=True)
        samps = samps * norm / (peak + EPSILON)
    if power is not None:
        cur_pow = jnp.sum(samps**2, axis=-1, keepdims=True) / samps.shape[-1]
        samps = samps * jnp.sqrt(power / jnp.maximum(cur_pow, EPSILON))
    return samps
