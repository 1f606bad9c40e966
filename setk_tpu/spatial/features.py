"""Spatial feature computation: IPD / GCC-PHAT / SRP-PHAT / MSC / DF.

Math parity: /root/reference/scripts/sptk/libs/spatial.py.  All features
are pure batched array programs; the MSC context stacking and pair loops
are static unrolls (pair count is a geometry constant).
"""

import jax
import jax.numpy as jnp
import numpy as np

from setk_tpu.utils.common import EPSILON

__all__ = [
    "linear_tdoa_grid", "gcc_phat_linear", "gcc_phat_diag", "srp_phat_linear",
    "smooth_angular_spectrogram", "msc", "ipd", "directional_feats"
]


def smooth_angular_spectrogram(spectra: jax.Array,
                               context: int) -> jax.Array:
    """Temporal context averaging of an angular spectrogram (..., T, D).

    Each frame becomes the mean of frames [t - context, t + context]
    with edge-clamped indices — the C++ SRP computor's optional
    smoothing pass (/root/reference/include/srp-phat.cc:76-88, exposed
    as --smooth-context in src/compute-srp-phat.cc).
    """
    if context <= 0:
        return spectra
    t = spectra.shape[-2]
    acc = 0
    for c in range(-context, context + 1):
        idx = np.clip(np.arange(t) + c, 0, t - 1)
        acc = acc + jnp.take(spectra, jnp.asarray(idx), axis=-2)
    return acc / (2 * context + 1)


def linear_tdoa_grid(dist,
                     speed: float = 343,
                     num_bins: int = 513,
                     samp_doa: bool = True,
                     sample_frequency: int = 16000,
                     num_doa: int = 181,
                     max_doa: float = np.pi) -> np.ndarray:
    """Steering transform T_{ij} = e^{-j omega_i tau_j}: (F, D) complex.

    Parity: /root/reference/scripts/sptk/libs/spatial.py:11-34.
    """
    dist = abs(dist)
    if samp_doa:
        tau = np.cos(np.linspace(0, max_doa, num_doa)) * dist / speed
    else:
        max_tdoa = dist / speed
        tau = np.linspace(max_tdoa, -max_tdoa, num_doa)
    omega = np.linspace(0, sample_frequency / 2, num_bins) * 2 * np.pi
    return np.exp(-1j * np.outer(omega, tau)).astype(np.complex64)


def _phase_spectrum(si, sj, transform, normalize, apply_floor):
    coherence = jnp.exp(1j * (jnp.angle(si) - jnp.angle(sj)))
    spectrum = jnp.real(coherence @ transform)
    if normalize:
        spectrum = spectrum / jnp.max(
            jnp.maximum(jnp.abs(spectrum), EPSILON))
    if apply_floor:
        spectrum = jnp.maximum(spectrum, 0)
    return spectrum


def gcc_phat_linear(si: jax.Array,
                    sj: jax.Array,
                    dij: float,
                    normalize: bool = True,
                    apply_floor: bool = True,
                    **kwargs) -> jax.Array:
    """GCC-PHAT angular spectrum for one linear-array pair: (T, D).

    Parity: /root/reference/scripts/sptk/libs/spatial.py:37-57.
    """
    transform = jnp.asarray(linear_tdoa_grid(dij, **kwargs))
    return _phase_spectrum(si, sj, transform, normalize, apply_floor)


def gcc_phat_diag(si: jax.Array,
                  sj: jax.Array,
                  angle_delta: float,
                  d: float,
                  speed: float = 343,
                  num_doas: int = 121,
                  sr: int = 16000,
                  normalize: bool = True,
                  num_bins: int = 513,
                  apply_floor: bool = True) -> jax.Array:
    """GCC-PHAT between diagonal mics of a circular array: (T, D).

    Parity: /root/reference/scripts/sptk/libs/spatial.py:60-92.
    """
    doa_samp = np.linspace(0, np.pi * 2, num_doas)
    tau = np.cos(angle_delta - doa_samp) * d / speed
    omega = np.linspace(0, sr / 2, num_bins) * 2 * np.pi
    trans = jnp.asarray(np.exp(-1j * np.outer(omega, tau)).astype(
        np.complex64))
    return _phase_spectrum(si, sj, trans, normalize, apply_floor)


def srp_phat_linear(spectra: jax.Array,
                    topo,
                    normalize: bool = True,
                    apply_floor: bool = True,
                    **kwargs) -> jax.Array:
    """SRP-PHAT for a linear array: sum of pairwise GCC, (T, D).

    spectra: (N, T, F); topo: list of mic positions.
    Parity: /root/reference/scripts/sptk/libs/spatial.py:95-123.
    """
    if not isinstance(topo, (list, tuple)):
        raise ValueError("Linear topology must be a list/tuple")
    n = spectra.shape[0]
    if n != len(topo):
        raise ValueError(f"{len(topo)} mics but {n}-channel STFT")
    if n == 2:
        return gcc_phat_linear(spectra[0], spectra[1], topo[1] - topo[0],
                               normalize=normalize, apply_floor=apply_floor,
                               **kwargs)
    srp = 0
    for i in range(n):
        for j in range(i + 1, n):
            srp = srp + gcc_phat_linear(spectra[i], spectra[j],
                                        topo[j] - topo[i],
                                        normalize=normalize,
                                        apply_floor=apply_floor, **kwargs)
    return srp * 2 / (n * (n - 1))


def msc(spectrogram: jax.Array,
        context: int = 1,
        normalize: bool = True) -> jax.Array:
    """Magnitude-squared coherence feature: (N, T, F) -> (T, F).

    Context stacking uses edge-clamped frame indices.
    Parity: /root/reference/scripts/sptk/libs/spatial.py:126-160.
    """
    n, t, f = spectrogram.shape
    ctx = context * 2 + 1
    # C x N x T x F with clamped shifts
    idx = np.clip(
        np.arange(t)[None, :] + np.arange(-context, context + 1)[:, None], 0,
        t - 1)
    stacked = spectrogram[:, idx]  # N x C x T x F
    stacked = jnp.swapaxes(stacked, 0, 1)  # C x N x T x F
    numerator = jnp.einsum("ab...,bc...->ac...",
                           jnp.swapaxes(stacked, 0, 1),
                           jnp.conj(stacked)) / ctx
    diag = jnp.abs(jnp.diagonal(numerator, axis1=0, axis2=1))  # T x F x N
    diag = jnp.transpose(diag, (2, 0, 1))  # N x T x F
    denominator = jnp.sqrt(jnp.einsum("a...,b...->ab...", diag, diag))
    icc = jnp.abs(numerator / denominator)
    coh = jnp.sum(jnp.diagonal(icc, axis1=0, axis2=1))
    coh = coh + jnp.sum(jnp.sum(icc, axis=0), axis=0)
    coh = coh / (n * (n - 1))
    if normalize:
        coh = coh / jnp.max(jnp.abs(coh))
    return coh


def ipd(si: jax.Array,
        sj: jax.Array,
        cos: bool = False,
        sin: bool = False) -> jax.Array:
    """IPD / cosIPD / [cosIPD, sinIPD] features over (T, F) pairs.

    Parity: /root/reference/scripts/sptk/libs/spatial.py:163-181.
    """
    ipd_mat = jnp.angle(si) - jnp.angle(sj)
    if not cos:
        return jnp.mod(ipd_mat + jnp.pi, 2 * jnp.pi) - jnp.pi
    cos_ipd = jnp.cos(ipd_mat)
    if not sin:
        return cos_ipd
    return jnp.concatenate([cos_ipd, jnp.sin(ipd_mat)], axis=-1)


def directional_feats(spectrogram: jax.Array,
                      steer_vector: jax.Array,
                      df_pair=None) -> jax.Array:
    """Directional features cos(IPD_obs - IPD_steer) averaged over pairs.

    spectrogram (M, F, T), steer_vector (M, F) -> (T, F).
    Parity: /root/reference/scripts/sptk/libs/spatial.py:184-208.
    """
    m = spectrogram.shape[0]
    if df_pair is None:
        df_pair = [(i, j) for i in range(m) for j in range(i + 1, m)]
    arg_s = jnp.angle(spectrogram)
    arg_t = jnp.angle(steer_vector)
    feats = []
    for i, j in df_pair:
        delta_s = arg_s[i] - arg_s[j]  # F x T
        delta_t = (arg_t[i] - arg_t[j])[:, None]  # F x 1
        feats.append(jnp.cos(delta_s - delta_t))
    return jnp.transpose(jnp.mean(jnp.stack(feats), axis=0))
