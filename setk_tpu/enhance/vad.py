"""Voice activity detection: frame classifier + hangover state machine.

The reference wraps py-webrtcvad (/root/reference/scripts/sptk/do_vad.py,
unavailable here) behind a hangover ``VoiceSpliter``; this module keeps
the exact hangover/segment semantics (:16-73) but supplies a
self-contained frame classifier — adaptive energy VAD with a tracked
noise floor — that runs as a jitted ``lax.scan``.

Also provides the energy-based T-F mask filter used by the adaptive
beamformer CLI (/root/reference/scripts/sptk/apply_adaptive_beamformer.py:
50-71).
"""

import jax
import jax.numpy as jnp
import numpy as np

from setk_tpu.utils.common import EPSILON

__all__ = ["energy_frame_vad", "VoiceSplitter", "remove_silence", "vad_masks",
           "apply_vad_filter"]


def energy_frame_vad(samps: jax.Array,
                     frame_size: int,
                     threshold_db: float = 6.0,
                     floor_alpha: float = 0.999,
                     attack_alpha: float = 0.95) -> jax.Array:
    """Per-frame speech activity from adaptive-noise-floor energy.

    Frames of ``frame_size`` samples; a frame is active when its log
    energy exceeds the tracked noise floor by ``threshold_db``.  The
    floor rises slowly (floor_alpha) and falls fast toward quieter
    frames (attack_alpha), the standard minimum-statistics heuristic.
    Returns a bool array of num_frames.
    """
    n_frames = samps.shape[-1] // frame_size
    frames = samps[..., :n_frames * frame_size].reshape(
        *samps.shape[:-1], n_frames, frame_size)
    energy_db = 10.0 * jnp.log10(
        jnp.mean(frames.astype(jnp.float32)**2, axis=-1) + EPSILON)

    def step(floor, e):
        rising = e > floor
        floor = jnp.where(rising, floor_alpha * floor + (1 - floor_alpha) * e,
                          attack_alpha * floor + (1 - attack_alpha) * e)
        return floor, e > floor + threshold_db

    # initialize the floor from the lowest-decile energy
    init = jnp.percentile(energy_db, 10.0, axis=-1)
    _, active = jax.lax.scan(step, init, jnp.moveaxis(energy_db, -1, 0))
    return jnp.moveaxis(active, 0, -1)


class VoiceSplitter:
    """Hangover state machine over per-frame decisions.

    Semantics parity with the reference VoiceSpliter
    (/root/reference/scripts/sptk/do_vad.py:16-73): ``cache_size``
    consecutive active frames open a segment (begin backdated by
    cache_size), the same count of inactive frames closes it.
    """

    def __init__(self, cache_size: int):
        if cache_size <= 0:
            raise ValueError("cache_size must be >= 1")
        self.cache_size = cache_size
        self.reset()

    def reset(self):
        self.cur_steps = 0
        self.cur_frame = 0
        self.voiced = False
        self.segment_beg = []
        self.segment_end = []

    def run(self, active: bool):
        if active and not self.voiced:
            if self.cur_steps < self.cache_size:
                self.cur_steps += 1
            if self.cur_steps == self.cache_size:
                self.voiced = True
                self.segment_beg.append(self.cur_frame)
        if not active and self.voiced:
            if self.cur_steps:
                self.cur_steps -= 1
            if self.cur_steps == 0:
                self.voiced = False
                self.segment_end.append(self.cur_frame)
        self.cur_frame += 1

    def report(self, voice: bool = True):
        if self.voiced and self.segment_beg[-1] != self.cur_frame:
            self.segment_end.append(self.cur_frame)
            self.voiced = False
        segments = [(beg - self.cache_size, end)
                    for beg, end in zip(self.segment_beg, self.segment_end)]
        if voice:
            return segments
        nsegs = []
        prev = 0
        for i, (m, n) in enumerate(segments):
            if i == 0:
                if m != 0:
                    nsegs.append((0, m))
            else:
                nsegs.append((prev, m))
            prev = n
        return nsegs


def remove_silence(samps: np.ndarray,
                   sr: int = 16000,
                   chunk_ms: int = 20,
                   cache_size: int = 5,
                   threshold_db: float = 6.0):
    """Drop silent regions: the do_vad.py pipeline with the energy VAD.

    Returns (concatenated voiced samples, list of (beg, end) sample
    segments); empty output when no voiced segment is found.
    """
    step = int(chunk_ms * sr / 1000.0)
    active = np.asarray(
        energy_frame_vad(jnp.asarray(samps), step,
                         threshold_db=threshold_db))
    splitter = VoiceSplitter(cache_size)
    for a in active:
        splitter.run(bool(a))
    segments = splitter.report(voice=True)
    gather = [samps[..., max(s, 0) * step:(e + 1) * step]
              for s, e in segments]
    if not gather:
        return np.zeros((0,), dtype=samps.dtype), []
    voiced = np.concatenate(gather, axis=-1)
    return voiced, [(max(s, 0) * step, (e + 1) * step) for s, e in segments]


def vad_masks(spectrogram: jax.Array, proportion: float):
    """Energy-proportion silence mask: keep proportion*100% of the energy.

    spectrogram (F, T) complex -> (silence_mask (T, F) bool, count).  The
    threshold is the magnitude at which the cumulative sorted energy
    exceeds (1 - proportion) of the total; bins below it are silence.
    Parity: compute_vad_masks in
    /root/reference/scripts/sptk/apply_adaptive_beamformer.py:50-71
    (vectorized: sort + cumsum + searchsorted instead of the host loop).
    """
    energy = jnp.abs(spectrogram)
    flat = jnp.sort(energy.reshape(-1))
    csum = jnp.cumsum(flat)
    filter_energy = csum[-1] * (1.0 - proportion)
    index = jnp.searchsorted(csum, filter_energy, side="right")
    threshold = flat[jnp.minimum(index, flat.shape[0] - 1)]
    silence = (energy < threshold).T
    return silence, index


def apply_vad_filter(mask: jax.Array, silence: jax.Array,
                     floor: float = 1.0e-4) -> jax.Array:
    """Floor the T-F mask on detected-silence bins (reference run() step)."""
    return jnp.where(silence, floor, mask)
