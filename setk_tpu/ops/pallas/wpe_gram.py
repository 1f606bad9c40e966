"""Pallas TPU kernels: fused WPE weighted Gram + filter application.

The XLA WPE iteration is HBM-bound on tap-matrix redundancy: the
(B, F, N*K, T) delayed-tap stack is just shifted copies of the
observations, yet building it costs ~35 ms and every Gram/apply pass
re-streams ~2.2 GB of it (benchmarks/profile_wpe.py: tap build 35.5,
y2+gram 33/iter, apply 6.8/iter at B=32 x 8 s).  These kernels never
materialize taps: each grid step loads a block of raw observation rows
(bins x N x T planar, T in lanes), builds the [current | taps] design
matrix A in VMEM as masked lane-shifts, and

  * ``wpe_gram_pallas``  — computes the previous iteration's
    dereverberated signal d = y - G^H taps IN-KERNEL (G = 0 on the
    first iteration), the context-smoothed power lambda from d (the
    reference's compute_lambda, /root/reference/scripts/sptk/libs/
    wpe.py:32-55), and emits the sqrt(1/lambda)-weighted Gram
    A W A^H via error-compensated bf16 K-stacked MXU dots — only the
    (bins, 72, 72) Gram planes touch HBM;
  * ``wpe_apply_pallas`` — rebuilds the taps the same way and emits the
    final d.

The per-bin normal-equation solve stays in the lane-batched Cholesky
kernel (ops/pallas/cholesky.py).  Math parity:
/root/reference/scripts/sptk/libs/wpe.py:14-77 via enhance/wpe.py.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from setk_tpu.utils.common import EPSILON

__all__ = ["wpe_gram_pallas", "wpe_apply_pallas", "wpe_fused_supported"]

_LANES = 128
_BPB = 8          # bins per grid block
_GROWS = 72       # padded Gram rows/cols (N + N*taps <= 66 for defaults)


def wpe_fused_supported(n_mics: int, taps: int) -> bool:
    return n_mics <= 8 and (taps + 1) * n_mics <= _GROWS


def _shift_row(row, d, t):
    """row (R, T) delayed by d frames with zero head (tap semantics of
    compute_tap_mat: tap[t] = y[t - d], 0 for t < d)."""
    if d == 0:
        return row
    return jnp.pad(row[:, :t - d], ((0, 0), (d, 0)))


def _design_rows(obs_re_ref, obs_im_ref, b_i, n, taps, delay, t):
    """[current mics | taps] blocks for one bin: lists of (n, T) tiles.

    Whole-mic-block shifts (one padded slice per TAP, not per tap x mic
    row): the per-(1, T)-row form issued 66 tiny Mosaic ops per bin and
    the gram kernel measured VPU-issue-bound, ~19 ms/pass at the bench
    shape (benchmarks/profile_wpe_fused.py, round-3 budget).
    """
    cur_re = obs_re_ref[b_i]                          # (n, T)
    cur_im = obs_im_ref[b_i]
    a_re = [cur_re]
    a_im = [cur_im]
    for k in range(taps):
        d = delay + k
        a_re.append(_shift_row(cur_re, d, t))
        a_im.append(_shift_row(cur_im, d, t))
    return a_re, a_im


def _dereverb(a_re, a_im, g_re_ref, g_im_ref, b_i, n, taps, t):
    """d = current - taps @ conj(G) for one bin: (N_pad=8, T) planar."""
    nk = n * taps
    pad8 = jnp.zeros((8 - n, t), jnp.float32)
    cur_re = jnp.concatenate([a_re[0], pad8], axis=0)
    cur_im = jnp.concatenate([a_im[0], pad8], axis=0)
    tap_re = jnp.concatenate(a_re[1:], axis=0)        # (NK, T)
    tap_im = jnp.concatenate(a_im[1:], axis=0)
    g_re = g_re_ref[b_i]                              # (NK, N)
    g_im = g_im_ref[b_i]
    gp_re = jnp.pad(g_re, ((0, 0), (0, 8 - n)))
    gp_im = jnp.pad(g_im, ((0, 0), (0, 8 - n)))
    dot_tn = partial(jax.lax.dot_general,
                     dimension_numbers=(((0,), (0,)), ((), ())),
                     preferred_element_type=jnp.float32)
    # taps @ conj(G): (NK, 8)^T-contract (NK, T) -> (8, T); f32-grade
    # via the hi/lo 3-pass stack on the contraction (sublane) axis
    def stack3(x, order):
        h = x.astype(jnp.bfloat16)
        l = (x - h.astype(jnp.float32)).astype(jnp.bfloat16)
        return jnp.concatenate([h, h, l] if order == 0 else [h, l, h],
                               axis=0)

    tr3, ti3 = stack3(tap_re, 1), stack3(tap_im, 1)
    gr3, gi3 = stack3(gp_re, 0), stack3(gp_im, 0)
    # (a + bi)(c - di): re = ac + bd, im = bc - ad   [conj on G]
    pr = dot_tn(gr3, tr3) + dot_tn(gi3, ti3)          # (8, T)
    pi = dot_tn(gr3, ti3) - dot_tn(gi3, tr3)
    return cur_re - pr, cur_im - pi


def _lambda_weights(d_re, d_im, n, context, t):
    """Context-smoothed mean power -> sqrt(1/lambda): (1, T)."""
    power = jnp.sum(d_re * d_re + d_im * d_im, axis=0,
                    keepdims=True) * (1.0 / n)        # (1, T)
    if context > 0:
        iota = jax.lax.broadcasted_iota(jnp.int32, (1, t), 1)
        acc = power
        counts = jnp.ones((1, t), jnp.float32)
        for c in range(1, context + 1):
            acc = acc + _shift_row(power, c, t)       # p[t - c]
            acc = acc + jnp.pad(power[:, c:], ((0, 0), (0, c)))  # p[t + c]
            counts = counts + (iota >= c).astype(jnp.float32)
            counts = counts + (iota < t - c).astype(jnp.float32)
        power = acc / counts
    return jax.lax.rsqrt(jnp.maximum(power, EPSILON))


def _wpe_gram_kernel(n, taps, delay, context, use_g, ext_lambda,
                     obs_re_ref, obs_im_ref, g_re_ref, g_im_ref, lam_ref,
                     gram_re_ref, gram_im_ref):
    t = obs_re_ref.shape[-1]
    cols = (taps + 1) * n
    dot_nt = partial(jax.lax.dot_general,
                     dimension_numbers=(((1,), (1,)), ((), ())),
                     preferred_element_type=jnp.float32)
    gram_re_ref[...] = jnp.zeros_like(gram_re_ref)
    gram_im_ref[...] = jnp.zeros_like(gram_im_ref)
    for b_i in range(_BPB):
        a_re, a_im = _design_rows(obs_re_ref, obs_im_ref, b_i, n, taps,
                                  delay, t)
        if ext_lambda:
            # WPD: the power weights come from the enhanced output of
            # the previous outer iteration, supplied as an operand
            sw = jax.lax.rsqrt(jnp.maximum(lam_ref[b_i][None], EPSILON))
        else:
            if use_g:
                d_re, d_im = _dereverb(a_re, a_im, g_re_ref, g_im_ref,
                                       b_i, n, taps, t)
            else:
                # first iteration: d = the observations themselves
                pad8 = jnp.zeros((8 - n, t), jnp.float32)
                d_re = jnp.concatenate([a_re[0], pad8], axis=0)
                d_im = jnp.concatenate([a_im[0], pad8], axis=0)
            sw = _lambda_weights(d_re, d_im, n, context, t)

        aw_re = jnp.concatenate(a_re, axis=0) * sw    # (cols, T)
        aw_im = jnp.concatenate(a_im, axis=0) * sw

        # THREE-term bf16 split (6-pass K-stack): the 2-term 3-pass
        # form's sqrt(T)-accumulated error (~7e-4 max rel at T=501)
        # forced a 8e-6*NK loading floor on the solve, and THAT loading
        # cost ~20 dB of golden parity on real speech (the WPE filter
        # shift is O(eps * cond)).  The 3-term split restores
        # ~f32-grade entries (missing terms are <= 2^-24 relative) for
        # ~0.5 ms more MXU in a ~19 ms VPU-bound pass — the solve runs
        # the plain 1e-6 hermitian loading again, matching the XLA
        # path bit-for-policy.  Stack orders: A=[h,h,h,m,m,l] against
        # B=[h,m,l,h,m,h] -> hh+hm+hl+mh+mm+lh.
        def split3(x):
            h = x.astype(jnp.bfloat16)
            rem = x - h.astype(jnp.float32)
            m = rem.astype(jnp.bfloat16)
            l = (rem - m.astype(jnp.float32)).astype(jnp.bfloat16)
            return h, m, l

        def stack6(hml, side):
            h, m, l = hml
            parts = ([h, h, h, m, m, l] if side == 0 else
                     [h, m, l, h, m, h])
            return jnp.concatenate(parts, axis=1)

        # one h/m/l split per operand, shared by both stack orders
        sre, sim = split3(aw_re), split3(aw_im)
        r0, i0 = stack6(sre, 0), stack6(sim, 0)
        r1, i1 = stack6(sre, 1), stack6(sim, 1)
        # gram = (Aw)(Aw)^H over t: re = ArAr^T + AiAi^T,
        #                           im = AiAr^T - ArAi^T
        g_re = dot_nt(r0, r1) + dot_nt(i0, i1)        # (cols, cols)
        g_im = dot_nt(i0, r1) - dot_nt(r0, i1)
        # symmetrize HERE (tiny in-VMEM transposes): the downstream
        # planar solve (ops/pallas/cholesky.solve_wpe_gram_pallas)
        # consumes the planes as-is, and the XLA-side 0.5 (A + A^H)
        # pass on the assembled complex gram cost a full HBM round trip
        g_re = 0.5 * (g_re + g_re.T)
        g_im = 0.5 * (g_im - g_im.T)
        gram_re_ref[b_i, 0:cols, 0:cols] = g_re
        gram_im_ref[b_i, 0:cols, 0:cols] = g_im


def _wpe_apply_kernel(n, taps, delay, obs_re_ref, obs_im_ref, g_re_ref,
                      g_im_ref, d_re_ref, d_im_ref):
    t = obs_re_ref.shape[-1]
    for b_i in range(_BPB):
        a_re, a_im = _design_rows(obs_re_ref, obs_im_ref, b_i, n, taps,
                                  delay, t)
        d_re, d_im = _dereverb(a_re, a_im, g_re_ref, g_im_ref, b_i, n,
                               taps, t)
        d_re_ref[b_i] = d_re
        d_im_ref[b_i] = d_im


def _prep(obs_re, obs_im, g_re, g_im, n, taps):
    """Pad the bin axis to the block size; returns padded arrays + bins."""
    bins, _, t = obs_re.shape
    nk = n * taps
    pad = (-bins) % _BPB
    if pad:
        obs_re = jnp.pad(obs_re, ((0, pad), (0, 0), (0, 0)))
        obs_im = jnp.pad(obs_im, ((0, pad), (0, 0), (0, 0)))
        g_re = jnp.pad(g_re, ((0, pad), (0, 0), (0, 0)))
        g_im = jnp.pad(g_im, ((0, pad), (0, 0), (0, 0)))
    return obs_re, obs_im, g_re, g_im, bins


@partial(jax.jit, static_argnames=("n", "taps", "delay", "context",
                                   "use_g", "interpret"))
def wpe_gram_pallas(obs_re, obs_im, g_re, g_im, n, taps, delay, context,
                    use_g=True, lam=None, interpret=False):
    """Weighted [current | taps] Gram per bin.

    obs planar (BINS, N, T); g planar (BINS, N*taps, N) (ignored when
    ``use_g`` is False — first iteration).  ``lam`` (BINS, T) supplies
    EXTERNAL power weights (the WPD path, where lambda is the enhanced
    output power of the previous outer iteration) instead of the
    in-kernel context-smoothed dereverb power.  Returns gram planes
    (BINS, 72, 72) f32 with the valid (taps+1)*N block at [:cols, :cols]
    (row/col order [current | taps], matching enhance.wpe.wpe_step's y2).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    ext_lambda = lam is not None
    if lam is None:
        lam = jnp.ones((obs_re.shape[0], obs_re.shape[-1]), jnp.float32)
    obs_re, obs_im, g_re, g_im, bins = _prep(obs_re, obs_im, g_re, g_im,
                                             n, taps)
    binsp, _, t = obs_re.shape
    if binsp != lam.shape[0]:
        lam = jnp.pad(lam, ((0, binsp - lam.shape[0]), (0, 0)),
                      constant_values=1.0)
    nk = n * taps
    obs_spec = pl.BlockSpec((_BPB, n, t), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    g_spec = pl.BlockSpec((_BPB, nk, n), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    lam_spec = pl.BlockSpec((_BPB, t), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((_BPB, _GROWS, _GROWS), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    gr, gi = pl.pallas_call(
        partial(_wpe_gram_kernel, n, taps, delay, context, use_g,
                ext_lambda),
        grid=(binsp // _BPB,),
        in_specs=[obs_spec, obs_spec, g_spec, g_spec, lam_spec],
        out_specs=[out_spec, out_spec],
        out_shape=[jax.ShapeDtypeStruct((binsp, _GROWS, _GROWS),
                                        jnp.float32)] * 2,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(obs_re, obs_im, g_re, g_im, lam)
    return gr[:bins], gi[:bins]


@partial(jax.jit, static_argnames=("n", "taps", "delay", "interpret"))
def wpe_apply_pallas(obs_re, obs_im, g_re, g_im, n, taps, delay,
                     interpret=False):
    """Final filter application: d planes (BINS, 8, T) f32 (rows 0..N-1
    valid)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    obs_re, obs_im, g_re, g_im, bins = _prep(obs_re, obs_im, g_re, g_im,
                                             n, taps)
    binsp, _, t = obs_re.shape
    nk = n * taps
    obs_spec = pl.BlockSpec((_BPB, n, t), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    g_spec = pl.BlockSpec((_BPB, nk, n), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((_BPB, 8, t), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    dr, di = pl.pallas_call(
        partial(_wpe_apply_kernel, n, taps, delay),
        grid=(binsp // _BPB,),
        in_specs=[obs_spec, obs_spec, g_spec, g_spec],
        out_specs=[out_spec, out_spec],
        out_shape=[jax.ShapeDtypeStruct((binsp, 8, t), jnp.float32)] * 2,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(obs_re, obs_im, g_re, g_im)
    return dr[:bins], di[:bins]
