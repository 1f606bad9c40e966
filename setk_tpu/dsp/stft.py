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
from setk_tpu.dsp import dft

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

    @cached_property
    def rdft_bases(self):
        """Window-folded forward DFT matmul bases (dsp/dft.py)."""
        return dft.rdft_basis(self.n_fft, self.padded_window)

    @cached_property
    def irdft_bases(self):
        """Window-folded inverse DFT matmul bases (dsp/dft.py)."""
        return dft.irdft_basis(self.n_fft, self.padded_window)

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

    Applies the center reflect-padding but NOT the window.  When the
    frame length is a hop multiple (the usual 50/75% overlap), framing
    is a reshape into hop blocks plus R = n_fft//hop shifted slices —
    no gather, so XLA emits dense copies (the overlap_add trick, run
    backwards).
    """
    n_fft, hop = cfg.n_fft, cfg.frame_hop
    if cfg.center:
        pad = [(0, 0)] * (samps.ndim - 1) + [(n_fft // 2, n_fft // 2)]
        samps = jnp.pad(samps, pad, mode="reflect")
    n_samps = samps.shape[-1]
    n_frames = 1 + (n_samps - n_fft) // hop
    if n_fft % hop == 0:
        ratio = n_fft // hop
        n_blocks = n_frames + ratio - 1
        blocks = samps[..., :n_blocks * hop].reshape(
            *samps.shape[:-1], n_blocks, hop)
        return jnp.concatenate(
            [blocks[..., r:r + n_frames, :] for r in range(ratio)], axis=-1)
    # general fallback: static gather
    idx = (np.arange(n_frames)[:, None] * hop +
           np.arange(n_fft)[None, :])
    return samps[..., idx]


def _use_matmul_dft(impl: str, n_fft: int) -> bool:
    """Resolve the DFT implementation ("auto" picks the MXU matmul on a
    TPU target, matching covar_stats' device-aware dispatch)."""
    if impl == "matmul":
        return True
    if impl == "fft":
        return False
    if n_fft > dft.MAX_MATMUL_NFFT:
        return False
    default_dev = jax.config.jax_default_device
    if default_dev is not None:
        return default_dev.platform == "tpu"
    return jax.default_backend() == "tpu"


def forward_stft(samps: jax.Array,
                 cfg: StftConfig,
                 apply_abs: bool = False,
                 apply_log: bool = False,
                 apply_pow: bool = False,
                 impl: str = "auto",
                 precision: str = "high") -> jax.Array:
    """STFT of ``(..., S)`` real samples -> ``(..., T, F)`` complex64.

    Post-ops mirror the reference wrapper
    (/root/reference/scripts/sptk/libs/utils.py:96-138).
    ``impl``: "fft" (jnp.fft.rfft), "matmul" (window-folded DFT on the
    MXU, dsp/dft.py), or "auto" (matmul on TPU — 2.4x faster there).
    ``precision`` sets the MXU dot precision of the matmul path:
    "high" (3-pass bf16, the default) is transparent for float32 audio
    (94.9 dB SNR vs "highest" through the full MVDR enhance pipeline,
    measured on a v5e) at ~2x the matmul rate; "highest" for bit-grade
    parity work, "default" (1-pass bf16, ~52 dB) for throughput.
    """
    if apply_log:
        apply_abs = True
    if _use_matmul_dft(impl, cfg.n_fft):
        cos_b, msin_b = cfg.rdft_bases
        spec = dft.rdft_matmul(frame_signal(samps, cfg),
                               jnp.asarray(cos_b), jnp.asarray(msin_b),
                               precision=precision)
    else:
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
                 power: float | None = None,
                 impl: str = "auto",
                 precision: str = "high") -> jax.Array:
    """iSTFT of ``(..., T, F)`` complex -> ``(..., S)`` real samples.

    ``norm``/``power`` renormalize the output amplitude/power like the
    reference (/root/reference/scripts/sptk/libs/utils.py:142-173).
    ``nsamps`` trims or zero-pads to an exact length.  ``impl`` and
    ``precision`` as in ``forward_stft`` (the matmul path folds the
    synthesis window into the inverse-DFT basis).
    """
    n_fft, hop = cfg.n_fft, cfg.frame_hop
    n_frames = stft_mat.shape[-2]
    window = cfg.padded_window
    if _use_matmul_dft(impl, n_fft):
        b_re, b_im = cfg.irdft_bases
        frames = dft.irdft_matmul(stft_mat, jnp.asarray(b_re),
                                  jnp.asarray(b_im), precision=precision)
    else:
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
