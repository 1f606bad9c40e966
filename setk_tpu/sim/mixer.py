"""Multi-channel data simulation: RIR convolution + SNR/SDR mixing.

Behavioral parity: /root/reference/scripts/sptk/wav_simulate.py:17-312 —
SNR coefficient solving, room-response convolution with optional
early-reflection (1 ms pre-peak .. 50 ms post-peak) power reference,
speaker mixing at given SDRs, point/isotropic noise at given SNRs with
repeat/offset handling, peak normalization.

Convolutions run as a pow2-padded rFFT product on device (jitted per
pow2 bucket, so compile cache hits amortize across a corpus); the
surrounding mixing logic is thin host code over numpy views.
"""

from functools import lru_cache, partial

import numpy as np

from setk_tpu.utils.common import EPSILON, nextpow2

__all__ = [
    "coeff_snr", "fft_convolve", "add_room_response", "add_speaker",
    "add_point_noise", "simulate", "SimuConfig"
]


def coeff_snr(sig_pow, ref_pow, snr):
    """alpha with mix = a + alpha*b s.t. 10log10(Pa/(Pb alpha^2)) = snr."""
    return (ref_pow / (sig_pow * 10**(snr / 10) + EPSILON))**0.5


@lru_cache(maxsize=32)
def _conv_jit(n_fft):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def conv(sig, rir):
        fs = jnp.fft.rfft(sig, n_fft)
        fr = jnp.fft.rfft(rir, n_fft)
        return jnp.fft.irfft(fs * fr, n_fft)

    return conv


def fft_convolve(sig: np.ndarray, rir: np.ndarray, out_len=None) -> np.ndarray:
    """Full linear convolution of (..., S) with (..., R), truncated to
    ``out_len`` (default S), as a pow2-padded rFFT product.

    Dispatch: on the accelerator target the product is a jitted device
    program (compile cache hits amortize across a corpus — the batched
    regime, benchmarks/bench_sim.py); under ``host_hint()``/``on_host()``
    (the single-utterance CLI regime) it is scipy.fft with NO jax
    involvement — a fresh process would pay seconds of CPU-JAX
    trace+compile against a ~100 ms convolution, which is how the r05
    RTF head-to-head was initially LOST 100x to the reference's scipy
    path before this branch."""
    s_len, r_len = sig.shape[-1], rir.shape[-1]
    full = s_len + r_len - 1
    n_fft = nextpow2(full)
    from setk_tpu.utils.hostdev import tpu_target
    if tpu_target():
        out = np.asarray(_conv_jit(n_fft)(sig.astype(np.float32),
                                          rir.astype(np.float32)))
    else:
        # scipy.fft at next_fast_len (vs the device path's pow2
        # overshoot), f32-native pocketfft, all cores (the reference's
        # ss.fftconvolve equivalent runs single-threaded)
        from scipy import fft as sfft
        n = sfft.next_fast_len(full, real=True)
        fs = sfft.rfft(sig.astype(np.float32, copy=False), n, workers=-1)
        fr = sfft.rfft(rir.astype(np.float32, copy=False), n, workers=-1)
        out = sfft.irfft(fs * fr, n, workers=-1)
    out = out[..., :full]
    return out[..., :out_len if out_len is not None else s_len]


def add_room_response(spk, rir, early_energy=False, sr=16000):
    """Convolve a source with (N, R) RIRs -> ((N, S) images, ref power).

    ``early_energy=True`` returns the power of the early-reflection image
    (channel 0 RIR windowed 1 ms before to 50 ms after its peak).
    """
    if spk.ndim != 1:
        raise RuntimeError(f"Cannot convolve RIRs with {spk.ndim}D signals")
    s_len = spk.shape[-1]
    revb = fft_convolve(spk[None, :], np.atleast_2d(rir), out_len=s_len)
    if early_energy:
        rir_ch0 = np.atleast_2d(rir)[0]
        peak = int(np.argmax(rir_ch0))
        beg = max(0, int(peak - 0.001 * sr))
        end = min(rir_ch0.size, int(peak + 0.05 * sr))
        early = np.zeros_like(rir_ch0)
        early[beg:end] = rir_ch0[beg:end]
        early_rev = fft_convolve(spk, early, out_len=s_len)
        return revb, float(np.mean(early_rev**2))
    return revb, float(np.mean(revb[0]**2))


def add_speaker(mix_nsamps, src_spk, src_begin, sdr, src_rir=None,
                channel=-1, early_energy=False, sr=16000):
    """Speaker images scaled to the given SDRs vs speaker 0.

    Returns a list of (N, mix_nsamps) per-speaker images (speaker 0 at
    unit gain).
    """
    images, powers = [], []
    for i, spk in enumerate(src_spk):
        if src_rir is None:
            src = spk[None, :] if spk.ndim == 1 else spk
            images.append(src)
            powers.append(float(np.mean(src[0]**2)))
        else:
            rir = np.atleast_2d(src_rir[i])
            if channel >= 0:
                rir = rir[channel:channel + 1]
            revb, p = add_room_response(spk, rir, early_energy=early_energy,
                                        sr=sr)
            images.append(revb)
            powers.append(p)
    n_ch = images[0].shape[0]
    # f32 accumulation: the default f64 zeros doubled the mixing
    # traffic (~10 ms of the single-utterance RTF budget, r05)
    mix = [np.zeros([n_ch, mix_nsamps], dtype=np.float32)
           for _ in src_spk]
    ref_power = powers[0]
    for i, image in enumerate(images):
        dur = image.shape[-1]
        beg = src_begin[i]
        coeff = 1 if i == 0 else coeff_snr(powers[i], ref_power, sdr[i])
        mix[i][..., beg:beg + dur] += coeff * image
    return mix


def add_point_noise(mix_nsamps, ref_power, noises, noise_begin, snr,
                    noise_rir=None, channel=-1, repeat=False, sr=16000):
    """Sum of point-source noises at given SNRs vs ``ref_power``."""
    images, powers, durs = [], [], []
    for i, noise in enumerate(noises):
        beg = noise_begin[i]
        if not repeat:
            dur = min(noise.shape[-1], mix_nsamps - beg)
        else:
            dur = mix_nsamps - beg
            if noise.shape[-1] < dur:
                noise = np.pad(noise, (0, dur - noise.shape[-1]), mode="wrap")
        durs.append(dur)
        if noise_rir is None:
            src = noise[None, :] if noise.ndim == 1 else noise
            images.append(src)
            powers.append(float(np.mean(src[0, :dur]**2)))
        else:
            rir = np.atleast_2d(noise_rir[i])
            if channel >= 0:
                rir = rir[channel:channel + 1]
            revb, p = add_room_response(noise[:dur], rir, sr=sr)
            images.append(revb)
            powers.append(p)
    mix = np.zeros([images[0].shape[0], mix_nsamps], dtype=np.float32)
    for i, img in enumerate(images):
        beg, dur = noise_begin[i], durs[i]
        coeff = coeff_snr(powers[i], ref_power, snr[i])
        mix[..., beg:beg + dur] += coeff * img[..., :dur]
    return mix


class SimuConfig:
    """Keyword bag mirroring wav_simulate.py's CLI options."""

    def __init__(self, **kwargs):
        self.src_begin = kwargs.pop("src_begin", None)
        self.sdr = kwargs.pop("sdr", None)
        self.src_rir = kwargs.pop("src_rir", None)
        self.point_noise = kwargs.pop("point_noise", None)
        self.point_noise_rir = kwargs.pop("point_noise_rir", None)
        self.point_noise_snr = kwargs.pop("point_noise_snr", None)
        self.point_noise_begin = kwargs.pop("point_noise_begin", None)
        self.point_noise_repeat = kwargs.pop("point_noise_repeat", False)
        self.isotropic_noise = kwargs.pop("isotropic_noise", None)
        self.isotropic_snr = kwargs.pop("isotropic_snr", None)
        self.dump_channel = kwargs.pop("dump_channel", -1)
        self.norm_factor = kwargs.pop("norm_factor", 0.9)
        self.early_energy = kwargs.pop("early_energy", False)
        self.sr = kwargs.pop("sr", 16000)
        if kwargs:
            raise TypeError(f"Unknown simulate options: {list(kwargs)}")


def simulate(src_spk, **kwargs):
    """Full mixture simulation -> (mix, [ref spk ch0 ...], noise ch0).

    src_spk: list of 1-D sources.  See SimuConfig for options; semantics
    follow run_simu (/root/reference/scripts/sptk/wav_simulate.py:166-312).
    """
    cfg = SimuConfig(**kwargs)
    num_spk = len(src_spk)
    sdr = [0] + list(cfg.sdr or []) if num_spk > 1 else [0]
    if num_spk > 1 and len(sdr) != num_spk:
        raise RuntimeError("Need one SDR per additional speaker")
    src_begin = cfg.src_begin or [0] * num_spk
    mix_nsamps = max(b + s.size for b, s in zip(src_begin, src_spk))

    spk = add_speaker(mix_nsamps, src_spk, src_begin, sdr,
                      src_rir=cfg.src_rir, channel=cfg.dump_channel,
                      early_energy=cfg.early_energy, sr=cfg.sr)
    spk_utt = sum(spk)
    mix = spk_utt.copy()
    spk_power = float(np.mean(spk_utt[0]**2))

    noise = None
    if cfg.point_noise:
        point_begin = cfg.point_noise_begin or [0] * len(cfg.point_noise)
        noise = add_point_noise(mix_nsamps, spk_power, cfg.point_noise,
                                point_begin, cfg.point_noise_snr,
                                noise_rir=cfg.point_noise_rir,
                                channel=cfg.dump_channel,
                                repeat=cfg.point_noise_repeat, sr=cfg.sr)
        if spk_utt.shape[0] != noise.shape[0]:
            raise RuntimeError(
                f"Channel mismatch: {spk_utt.shape[0]} vs {noise.shape[0]}")
        mix = spk_utt + noise

    if cfg.isotropic_noise is not None:
        iso = cfg.isotropic_noise
        n_ch = spk_utt.shape[0]
        if n_ch == 1:
            iso = iso[None, :] if iso.ndim == 1 else (
                iso[cfg.dump_channel:cfg.dump_channel + 1]
                if cfg.dump_channel >= 0 else None)
            if iso is None:
                raise RuntimeError(
                    "Single-channel mixture vs multi-channel isotropic noise")
        elif iso.shape[0] != n_ch:
            raise RuntimeError(
                f"Isotropic channel mismatch: {n_ch} vs {iso.shape[0]}")
        dur = min(mix_nsamps, iso.shape[-1])
        chunk = iso[..., :dur]
        power = float(np.mean(chunk[0]**2)) if chunk.ndim > 1 else float(
            np.mean(chunk**2))
        coeff = coeff_snr(power, spk_power, cfg.isotropic_snr)
        mix[..., :dur] += coeff * chunk
        if noise is None:
            noise = np.zeros_like(mix)
            noise[..., :dur] += coeff * chunk
        else:
            noise[..., :dur] += coeff * chunk

    factor = cfg.norm_factor / (np.max(np.abs(mix)) + EPSILON)
    mix = mix.squeeze() * factor
    spk = [s[0] * factor for s in spk]
    return mix, spk, None if noise is None else noise[0] * factor
