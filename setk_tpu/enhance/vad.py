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

__all__ = ["energy_frame_vad", "gmm_frame_vad", "VoiceSplitter",
           "remove_silence", "vad_masks", "apply_vad_filter"]


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


# webrtcvad-style model structure: 6 subbands, 2-component speech and
# noise GMMs per band, per-band log-likelihood ratios, and an
# aggressiveness mode selecting the decision thresholds.  The reference
# wraps py-webrtcvad (trained model tables inside its C sources, which
# are neither available nor copyable here); this implementation keeps
# the same architecture but SELF-INITIALIZES from the utterance's own
# quietest frames and adapts online — decisions correlate with
# webrtcvad's but are not bit-identical (doc/MIGRATING.md).
_VAD_BAND_EDGES_HZ = (80.0, 250.0, 500.0, 1000.0, 2000.0, 3000.0, 4000.0)
# (total-LLR, per-band-LLR) activation thresholds per aggressiveness
# mode 0-3, in nats; higher mode = stricter = fewer active frames
_VAD_MODE_THRESHOLDS = ((0.5, 1.5), (1.0, 2.0), (2.0, 3.0), (3.5, 4.5))


def _band_energies(frames: jax.Array, sr: int) -> jax.Array:
    """(T, frame_size) frames -> (T, 6) log subband energies (nats)."""
    size = frames.shape[-1]
    win = jnp.hanning(size).astype(jnp.float32)
    spec = jnp.fft.rfft(frames.astype(jnp.float32) * win, axis=-1)
    power = jnp.abs(spec) ** 2                       # (T, size//2+1)
    freqs = np.fft.rfftfreq(size, 1.0 / sr)
    edges = np.asarray(_VAD_BAND_EDGES_HZ)
    # one-hot band-selection matmul (bins, bands)
    sel = ((freqs[:, None] >= edges[None, :-1])
           & (freqs[:, None] < edges[None, 1:])).astype(np.float32)
    return jnp.log(power @ jnp.asarray(sel) + EPSILON)


def gmm_frame_vad(samps: jax.Array,
                  frame_size: int,
                  sr: int = 16000,
                  mode: int = 1,
                  noise_alpha: float = 0.96,
                  speech_alpha: float = 0.985) -> jax.Array:
    """Per-frame speech activity from adaptive speech/noise subband GMMs.

    Same decision architecture as the reference's py-webrtcvad backend
    (/root/reference/scripts/sptk/do_vad.py:76-95 feeds 10-30 ms frames
    to webrtcvad.Vad(mode)): 6 subband log energies, a 2-component
    noise GMM and a 2-component speech GMM per band, the frame is
    active when the summed (or any single-band) speech/noise
    log-likelihood ratio clears the mode's threshold.  Models
    self-initialize from the lowest-decile band energies and adapt
    online (active frames update the speech model, inactive the noise
    model; the noise means are additionally pulled toward the running
    minimum — minimum statistics).  Runs as one jitted ``lax.scan``.
    Returns bool (..., num_frames), preserving leading batch axes like
    ``energy_frame_vad`` (each leading element is an independent
    utterance with its own adapted models).
    """
    if not 0 <= mode <= 3:
        raise ValueError(f"mode must be 0-3, got {mode}")
    lead = samps.shape[:-1]
    n_frames = samps.shape[-1] // frame_size
    frames = samps[..., :n_frames * frame_size].reshape(
        *lead, n_frames, frame_size)
    feats = _band_energies(frames, sr)               # (..., T, 6)
    thr_total, thr_band = _VAD_MODE_THRESHOLDS[mode]

    def log_pdf(x, mean, var):
        # x (6,), mean/var (6, 2) -> per-band 2-component logsumexp
        ll = (-0.5 * (x[:, None] - mean) ** 2 / var
              - 0.5 * jnp.log(2.0 * jnp.pi * var))
        return jax.scipy.special.logsumexp(ll, axis=-1) - jnp.log(2.0)

    def adapt(mean, var, x, alpha, active_w):
        # move the CLOSER component toward x (hard-assignment EM step)
        d2 = (x[:, None] - mean) ** 2 / var
        pick = jax.nn.one_hot(jnp.argmin(d2, -1), 2)          # (6, 2)
        rate = (1.0 - alpha) * active_w * pick
        # squared residual against the PRE-update mean (textbook EMA —
        # using the updated mean biases variances low)
        resid2 = (x[:, None] - mean) ** 2
        mean = mean + rate * (x[:, None] - mean)
        var = var + rate * (resid2 - var)
        return mean, jnp.clip(var, 0.25, 36.0)

    def step(state, x):
        n_mean, n_var, s_mean, s_var, nmin = state
        llr = log_pdf(x, s_mean, s_var) - log_pdf(x, n_mean, n_var)
        active = ((jnp.sum(llr) > thr_total) | (jnp.max(llr) > thr_band))
        aw = active.astype(jnp.float32)
        s_mean, s_var = adapt(s_mean, s_var, x, speech_alpha, aw)
        n_mean, n_var = adapt(n_mean, n_var, x, noise_alpha, 1.0 - aw)
        # minimum statistics: the running per-band minimum leaks upward
        # slowly and pulls the noise means down toward genuine silence
        nmin = jnp.minimum(nmin + 0.005, x)
        n_mean = n_mean + 0.02 * (nmin[:, None] - n_mean) * (1.0 - aw)
        # keep the models separated: speech means never drop below the
        # noise means (prevents model swapping on long noise runs)
        s_mean = jnp.maximum(s_mean, jnp.max(n_mean, -1)[:, None] + 1.0)
        return (n_mean, n_var, s_mean, s_var, nmin), active

    def scan_one(f):
        # init: noise components straddle the quiet floor, speech
        # components sit well above it (log-energy offsets ~ +6/+12 nats)
        floor = jnp.percentile(f, 10.0, axis=0)      # (6,)
        n_mean0 = jnp.stack([floor - 0.5, floor + 1.0], -1)   # (6, 2)
        s_mean0 = jnp.stack([floor + 4.0, floor + 8.0], -1)
        var0 = jnp.full((6, 2), 4.0, jnp.float32)
        init = (n_mean0, var0, s_mean0, var0, floor)
        _, active = jax.lax.scan(step, init, f)
        return active

    if lead:
        flat = feats.reshape((-1,) + feats.shape[-2:])
        return jax.vmap(scan_one)(flat).reshape(lead + (n_frames,))
    return scan_one(feats)


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
                   threshold_db: float = 6.0,
                   backend: str = "energy",
                   mode: int = 1):
    """Drop silent regions: the do_vad.py pipeline.

    ``backend="energy"`` uses the adaptive-noise-floor energy detector
    (tuned by ``threshold_db``); ``backend="gmm"`` the webrtcvad-style
    subband GMM detector (tuned by aggressiveness ``mode`` 0-3, the
    reference CLI's --mode).  Returns (concatenated voiced samples,
    list of (beg, end) sample segments); empty output when no voiced
    segment is found.
    """
    step = int(chunk_ms * sr / 1000.0)
    if backend == "gmm":
        active = np.asarray(
            gmm_frame_vad(jnp.asarray(samps), step, sr=sr, mode=mode))
    elif backend == "energy":
        active = np.asarray(
            energy_frame_vad(jnp.asarray(samps), step,
                             threshold_db=threshold_db))
    else:
        raise ValueError(f"unknown VAD backend: {backend}")
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
