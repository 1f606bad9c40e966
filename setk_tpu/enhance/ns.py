"""Single-channel noise suppression: OM-LSA gain with MCRA / iMCRA.

Math parity: /root/reference/scripts/sptk/libs/ns.py (equation-by-equation
Cohen 2001 / Cohen 2003).  The reference runs a Python loop per frame with
scipy quad for the exponential integral; here the whole recursion is one
``lax.scan`` over frames with a vectorized rational E1 approximation
(A&S 5.1.53/56 — jax.scipy.special.exp1's per-element loop is ~100x
slower than the whole recursion), all branches as ``where`` selects, and
the iMCRA U-window minima kept in a rolling (U, F) buffer carry.
"""

from dataclasses import dataclass, field
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from setk_tpu.dsp.window import make_window

__all__ = ["MCRAConfig", "IMCRAConfig", "mcra_gain", "imcra_gain", "omlsa",
           "exp1"]


def _win(name, width):
    # scipy.signal.get_window default is periodic; the reference builds
    # odd-length smoothing windows with it
    w = make_window(name if name != "hann" else "hann", width)
    return w.astype(np.float32)


def exp1(x):
    """Exponential integral E1(x), x > 0 — vectorized A&S 5.1.53/5.1.56.

    jax.scipy.special.exp1 evaluates a per-element while_loop that is
    profiled ~100x slower than the whole OM-LSA recursion on CPU; the
    classic rational approximations are branch-free jnp.where selects
    with |error| < 2e-7 — beyond fp32 resolution.
    """
    x = jnp.maximum(x, 1e-12)
    # 0 < x <= 1: -ln x + polynomial
    small = (-jnp.log(x) - 0.57721566 +
             x * (0.99999193 +
                  x * (-0.24991055 +
                       x * (0.05519968 +
                            x * (-0.00976004 + x * 0.00107857)))))
    # x >= 1: exp(-x)/x * P4(x)/Q4(x)
    p = (((x + 8.5733287401) * x + 18.059016973) * x +
         8.6347608925) * x + 0.2677737343
    q = (((x + 9.5733223454) * x + 25.6329561486) * x +
         21.0996530827) * x + 3.9584969228
    large = jnp.exp(-x) / x * (p / q)
    return jnp.where(x <= 1.0, small, large)


def _conv_same(x, w):
    """1-D 'same' convolution along the last axis via static shift-sums.

    jnp.convolve inside the per-frame scan makes XLA-CPU compile time
    blow up superlinearly in F; the smoothing windows here are tiny
    (3..31 taps), so an unrolled shifted-add chain is both faster to
    compile and to run.
    """
    width = w.shape[0]
    half = width // 2
    f = x.shape[-1]
    acc = None
    for i in range(width):
        # output[j] = sum_i w[i] * x[j + half - i] (zero-padded)
        shift = half - i
        if shift > 0:
            seg = jnp.pad(x[..., shift:], [(0, 0)] * (x.ndim - 1) +
                          [(0, shift)])
        elif shift < 0:
            seg = jnp.pad(x[..., :f + shift], [(0, 0)] * (x.ndim - 1) +
                          [(-shift, 0)])
        else:
            seg = x
        term = w[i] * seg
        acc = term if acc is None else acc + term
    return acc


@dataclass(frozen=True)
class MCRAConfig:
    alpha: float = 0.92
    delta: float = 5.0
    beta: float = 0.7
    alpha_s: float = 0.9
    alpha_d: float = 0.85
    alpha_p: float = 0.2
    gmin_db: float = -10.0
    xi_min_db: float = -18.0
    w_mcra: int = 1
    w_local: int = 1
    w_global: int = 15
    h_mcra: str = "hann"
    h_local: str = "hann"
    h_global: str = "hann"
    q_max: float = 0.95
    zeta_min_db: float = -10.0
    zeta_max_db: float = -5.0
    zeta_p_max_db: float = 10.0
    zeta_p_min_db: float = 0.0
    L: int = 125
    M: int = 128


def mcra_gain(stft: jax.Array, cfg: MCRAConfig = MCRAConfig(),
              eps: float = 1e-7) -> jax.Array:
    """OM-LSA gain with the MCRA noise estimator: (T, F) complex -> (T, F).

    Parity: /root/reference/scripts/sptk/libs/ns.py:56-209.
    """
    t_frames, f = stft.shape
    obs_power = jnp.abs(stft)**2
    w_m = jnp.asarray(_win(cfg.h_mcra, cfg.w_mcra * 2 + 1))
    w_g = jnp.asarray(_win(cfg.h_global, cfg.w_global * 2 + 1))
    w_l = jnp.asarray(_win(cfg.h_local, cfg.w_local * 2 + 1))
    gmin = 10**(cfg.gmin_db / 10)
    xi_min = 10**(cfg.xi_min_db / 10)
    zeta_min = 10**(cfg.zeta_min_db / 10)
    zeta_max = 10**(cfg.zeta_max_db / 10)
    zeta_p_min = 10**(cfg.zeta_p_min_db / 10)
    zeta_p_max = 10**(cfg.zeta_p_max_db / 10)
    beg = 10

    def interp_db(z):
        """eq.25 piecewise soft decision in [0, 1]."""
        frac = jnp.log10(jnp.maximum(z, 1e-20) / zeta_min) / np.log10(
            zeta_max / zeta_min)
        return jnp.where(z >= zeta_max, 1.0,
                         jnp.where(z > zeta_min, frac, 0.0))

    init = dict(
        gh1=jnp.ones(f),
        p_hat=jnp.ones(f),
        zeta=jnp.ones(f),
        zeta_peak=jnp.asarray(0.0),
        zeta_frame_pre=jnp.asarray(0.0),
        lambda_d_hat=obs_power[0],
        var_s=jnp.zeros(f),
        var_s_min=jnp.zeros(f),
        var_s_tmp=jnp.zeros(f),
    )

    def step(c, xs):
        t, pw = xs
        first = t == 0
        # eq.10: a posteriori SNR
        gamma = jnp.maximum(pw / jnp.maximum(c["lambda_d_hat"], eps), eps)
        # eq.18: a priori SNR (decision-directed)
        xi_hat = (cfg.alpha * c["gh1"]**2 * gamma +
                  (1 - cfg.alpha) * jnp.maximum(gamma - 1, 0))
        xi_hat = jnp.maximum(xi_hat, xi_min)
        # eq.15: LSA gain under speech presence
        v = gamma * xi_hat / (1 + xi_hat)
        gh1 = xi_hat * jnp.exp(0.5 * exp1(v)) / (1 + xi_hat)
        # eq.32-33: smoothed power
        var_sf = _conv_same(pw, w_m)
        var_s = jnp.where(first, pw,
                          cfg.alpha_s * c["var_s"] +
                          (1 - cfg.alpha_s) * var_sf)
        # eq.34-37: minima tracking with L-frame restart at phase `beg`
        restart = (t + 1) % cfg.L == beg
        var_s_min = jnp.where(
            first, var_s,
            jnp.where(restart, jnp.minimum(c["var_s_tmp"], var_s),
                      jnp.minimum(c["var_s_min"], var_s)))
        var_s_tmp = jnp.where(
            first, var_s,
            jnp.where(restart, var_s, jnp.minimum(c["var_s_tmp"], var_s)))
        # eq.39-40: speech presence indicator -> probability
        sr_ind = (var_s / jnp.maximum(var_s_min, eps)) > cfg.delta
        p_hat = cfg.alpha_p * c["p_hat"] + (1 - cfg.alpha_p) * sr_ind
        # eq.30-31: noise spectrum update
        alpha_d_hat = cfg.alpha_d + (1 - cfg.alpha_d) * p_hat
        lambda_d_hat = (alpha_d_hat * c["lambda_d_hat"] +
                        (1 - alpha_d_hat) * pw)
        # eq.23-25: a priori speech-absence via smoothed xi
        zeta = cfg.beta * c["zeta"] + (1 - cfg.beta) * xi_hat
        var_p_g = interp_db(_conv_same(zeta, w_g))
        var_p_l = interp_db(_conv_same(zeta, w_l))
        # eq.26-27: frame-level decision
        zeta_frame = jnp.mean(zeta[:cfg.M // 2 + 1])
        zeta_frame_pre = jnp.where(first, zeta_frame, c["zeta_frame_pre"])
        rising = zeta_frame > zeta_frame_pre
        zeta_peak = jnp.where(
            (zeta_frame > zeta_min) & rising,
            jnp.clip(zeta_frame, zeta_p_min, zeta_p_max), c["zeta_peak"])
        p_frame_soft = (jnp.log10(
            jnp.maximum(zeta_frame / jnp.maximum(zeta_min * zeta_peak,
                                                 1e-20), 1e-20)) /
                        np.log10(zeta_max / zeta_min))
        p_frame = jnp.where(
            zeta_frame <= zeta_min, 0.0,
            jnp.where(
                rising, 1.0,
                jnp.where(
                    zeta_frame <= zeta_min * zeta_peak, 0.0,
                    jnp.where(zeta_frame >= zeta_max * zeta_peak, 1.0,
                              p_frame_soft))))
        # eq.28: a priori speech absence
        q_hat = jnp.minimum(cfg.q_max, 1 - var_p_l * p_frame * var_p_g)
        # eq.9: speech presence probability
        p_inv = 1 + q_hat * (1 + xi_hat) * jnp.exp(-v) / jnp.maximum(
            1 - q_hat, eps)
        p = 1 / p_inv
        # eq.16: OM-LSA gain
        gain = gh1**p * gmin**(1 - p)
        new = dict(gh1=gh1, p_hat=p_hat, zeta=zeta, zeta_peak=zeta_peak,
                   zeta_frame_pre=zeta_frame, lambda_d_hat=lambda_d_hat,
                   var_s=var_s, var_s_min=var_s_min, var_s_tmp=var_s_tmp)
        return new, gain

    ts = jnp.arange(t_frames)
    _, gains = jax.lax.scan(step, init, (ts, obs_power))
    return gains


@dataclass(frozen=True)
class IMCRAConfig:
    alpha: float = 0.92
    alpha_s: float = 0.9
    alpha_d: float = 0.85
    b_min: float = 1.66
    gamma0: float = 4.6
    gamma1: float = 3.0
    zeta0: float = 1.67
    xi_min_db: float = -18.0
    gmin_db: float = -10.0
    w_mcra: int = 1
    h_mcra: str = "hann"
    beta: float = 1.47
    V: int = 15
    U: int = 8


def imcra_gain(stft: jax.Array, cfg: IMCRAConfig = IMCRAConfig(),
               eps: float = 1e-7) -> jax.Array:
    """OM-LSA gain with the iMCRA noise estimator: (T, F) -> (T, F).

    Parity: /root/reference/scripts/sptk/libs/ns.py:247-387; the reference
    keeps a growing list of windowed minima and slices the last U at every
    V-frame boundary — here that is a rolling (U, F) ring buffer carry.
    """
    t_frames, f = stft.shape
    obs_power = jnp.abs(stft)**2
    w_m = jnp.asarray(_win(cfg.h_mcra, cfg.w_mcra * 2 + 1))
    b_min = 1 / cfg.b_min
    xi_min = 10**(cfg.xi_min_db / 10)
    gain_min = 10**(cfg.gmin_db / 10)

    init = dict(
        gh1=jnp.ones(f),
        lambda_d_hat=obs_power[0],
        var_s=jnp.zeros(f),
        var_s_hat=jnp.zeros(f),
        var_s_min=jnp.zeros(f),
        var_s_min_sw=jnp.zeros(f),
        var_s_min_hat=jnp.zeros(f),
        var_s_min_sw_hat=jnp.zeros(f),
        ring_sw=jnp.zeros((cfg.U, f)),
        ring_sw_hat=jnp.zeros((cfg.U, f)),
    )

    def step(c, xs):
        t, pw = xs
        first = t == 0
        lambda_d = c["lambda_d_hat"] * cfg.beta
        # eq.3 posteriori SNR; eq.32 a priori SNR
        gamma = pw / jnp.maximum(lambda_d, eps)
        xi_hat = (cfg.alpha * c["gh1"]**2 * gamma +
                  (1 - cfg.alpha) * jnp.maximum(gamma - 1, 0))
        xi_hat = jnp.maximum(xi_hat, xi_min)
        # eq.33
        v = gamma * xi_hat / (1 + xi_hat)
        gh1 = xi_hat / (1 + xi_hat) * jnp.exp(0.5 * exp1(v))
        # eq.14-15: first smoothing + minima
        var_sf = _conv_same(pw, w_m)
        var_s = jnp.where(first, var_sf,
                          cfg.alpha_s * c["var_s"] +
                          (1 - cfg.alpha_s) * var_sf)
        var_s_min = jnp.where(first, var_sf,
                              jnp.minimum(c["var_s_min"], var_s))
        var_s_min_sw = jnp.where(first, var_sf,
                                 jnp.minimum(c["var_s_min_sw"], var_s))
        # eq.21: rough speech-absence indicator
        gamma_min = pw * b_min / jnp.maximum(var_s_min, eps)
        zeta = var_sf * b_min / jnp.maximum(var_s_min, eps)
        indicator = (gamma_min < cfg.gamma0) & (zeta < cfg.zeta0)
        # eq.26: indicator-gated second smoothing
        ind_conv = _conv_same(indicator.astype(pw.dtype), w_m)
        obs_conv = _conv_same(pw * indicator, w_m)
        var_sf_hat = jnp.where(ind_conv > 0,
                               obs_conv / jnp.maximum(ind_conv, eps),
                               c["var_s_hat"])
        var_s_hat = jnp.where(first, var_sf,
                              cfg.alpha_s * c["var_s_hat"] +
                              (1 - cfg.alpha_s) * var_sf_hat)
        var_s_min_hat = jnp.where(first, var_s,
                                  jnp.minimum(c["var_s_min_hat"], var_s_hat))
        var_s_min_sw_hat = jnp.where(
            first, var_sf, jnp.minimum(c["var_s_min_sw_hat"], var_s_hat))
        # eq.28-29: refined indicators -> a priori absence probability
        gamma_min_hat = pw * b_min / jnp.maximum(var_s_min_hat, eps)
        zeta_hat = var_s * b_min / jnp.maximum(var_s_min_hat, eps)
        qhat_band = (gamma_min_hat > 1) & (gamma_min_hat < cfg.gamma1) & (
            zeta_hat < cfg.zeta0)
        q_hat = jnp.where(qhat_band,
                          (cfg.gamma1 - gamma_min_hat) / (cfg.gamma1 - 1),
                          0.0)
        # eq.7: speech presence probability
        p_den = 1 + q_hat * (1 + xi_hat) / jnp.maximum(1 - q_hat,
                                                       eps) * jnp.exp(-v)
        p_hat = jnp.where(qhat_band, 1 / p_den, 0.0)
        p_hat = jnp.where(
            (gamma_min_hat >= cfg.gamma1) & (zeta_hat >= cfg.zeta0), 1.0,
            p_hat)
        # eq.10-11: noise estimate update
        alpha_d_hat = cfg.alpha_d + (1 - cfg.alpha_d) * p_hat
        lambda_d_hat = alpha_d_hat * c["lambda_d_hat"] + (
            1 - alpha_d_hat) * pw
        # ring buffers of windowed minima (reference appends per frame)
        slot = t % cfg.U
        ring_sw = c["ring_sw"].at[slot].set(var_s_min_sw)
        ring_sw_hat = c["ring_sw_hat"].at[slot].set(var_s_min_sw_hat)
        # V-frame boundary: restart the sliding windows
        boundary = (t + 1) % cfg.V == 0
        # only the last min(t+1, U) entries are valid
        valid = (jnp.arange(cfg.U) <
                 jnp.minimum(t + 1, cfg.U))[:, None]
        ring_min = jnp.min(jnp.where(valid, ring_sw, jnp.inf), axis=0)
        ring_min_hat = jnp.min(jnp.where(valid, ring_sw_hat, jnp.inf),
                               axis=0)
        var_s_min = jnp.where(boundary, ring_min, var_s_min)
        var_s_min_hat = jnp.where(boundary, ring_min_hat, var_s_min_hat)
        var_s_min_sw = jnp.where(boundary, var_s, var_s_min_sw)
        var_s_min_sw_hat = jnp.where(boundary, var_s_hat, var_s_min_sw_hat)
        gain = gh1**p_hat * gain_min**(1 - p_hat)
        new = dict(gh1=gh1, lambda_d_hat=lambda_d_hat, var_s=var_s,
                   var_s_hat=var_s_hat, var_s_min=var_s_min,
                   var_s_min_sw=var_s_min_sw, var_s_min_hat=var_s_min_hat,
                   var_s_min_sw_hat=var_s_min_sw_hat, ring_sw=ring_sw,
                   ring_sw_hat=ring_sw_hat)
        return new, gain

    ts = jnp.arange(t_frames)
    _, gains = jax.lax.scan(step, init, (ts, obs_power))
    return gains


def omlsa(stft: jax.Array, estimator: str = "imcra", **kwargs) -> jax.Array:
    """OM-LSA gain with the chosen noise estimator ('mcra'/'imcra')."""
    if estimator == "mcra":
        cfg = kwargs.pop("cfg", MCRAConfig(**kwargs))
        return mcra_gain(stft, cfg)
    if estimator == "imcra":
        cfg = kwargs.pop("cfg", IMCRAConfig(**kwargs))
        return imcra_gain(stft, cfg)
    raise ValueError(f"Unknown noise estimator: {estimator}")
