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
    (bins, cols, cols) Gram planes touch HBM;
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


def _shift_blk(x, d, t):
    """x (..., T) delayed by d frames with zero head (tap semantics of
    compute_tap_mat: tap[t] = y[t - d], 0 for t < d)."""
    if d == 0:
        return x
    pad = [(0, 0)] * (x.ndim - 1) + [(d, 0)]
    return jnp.pad(x[..., :t - d], pad)


def _design_blocks(obs_re_ref, obs_im_ref, taps, delay, t):
    """[current mics | taps] design for ALL bins of the block at once:
    (BPB, (taps+1)*n, T) planar pair.

    Round-4 relayout: the round-3 kernel built these per BIN; every
    elementwise/layout op now issues once per 8-bin block and only the
    MXU dots stay per-bin.  (The round-3 "VPU-issue-bound, ~0.5 ms of
    MXU" diagnosis that motivated this was WRONG — the pass was MXU
    executed-MAC bound and this relayout alone measured flat; the
    round-4 wins were the MAC-cutting identities and dropping the
    K-stack concats.  doc/KERNELS.md round-4.)
    """
    cur_re = obs_re_ref[...]                          # (BPB, n, T)
    cur_im = obs_im_ref[...]
    a_re = [cur_re] + [_shift_blk(cur_re, delay + k, t)
                       for k in range(taps)]
    a_im = [cur_im] + [_shift_blk(cur_im, delay + k, t)
                       for k in range(taps)]
    return (jnp.concatenate(a_re, axis=1),
            jnp.concatenate(a_im, axis=1))


def _dereverb_block(a_re, a_im, g_re_ref, g_im_ref, n, taps, t,
                    passes=3):
    """d = current - taps @ conj(G) for all bins: (BPB, 8, T) planar.

    Elementwise (split/stack) batched over the block; the four re/im
    cross products ride ONE per-bin MXU dot with both operands stacked
    ([g_re | g_im] columns against [t_re | t_im] lanes).

    BOTH callers use ``passes=3`` (the f32-grade hi/lo split).  A
    ``passes=1`` plain-bf16 lambda-side dereverb was tried for
    ~1 ms/pass and REVERTED: lambda feeds back through the solve
    iterations and the 2^-8-relative error compounded to a 5 dB
    on-chip golden WPE Si-SNR loss (doc/KERNELS.md round-4 notes);
    the knob stays only so the negative result is reproducible.
    """
    pad8 = jnp.zeros((_BPB, 8 - n, t), jnp.float32)
    cur_re = jnp.concatenate([a_re[:, :n], pad8], axis=1)
    cur_im = jnp.concatenate([a_im[:, :n], pad8], axis=1)
    gp_re = jnp.pad(g_re_ref[...], ((0, 0), (0, 0), (0, 8 - n)))
    gp_im = jnp.pad(g_im_ref[...], ((0, 0), (0, 0), (0, 8 - n)))

    def split2(x):
        h = x.astype(jnp.bfloat16)
        l = (x - h.astype(jnp.float32)).astype(jnp.bfloat16)
        return h, l

    dot_tn = partial(jax.lax.dot_general,
                     dimension_numbers=(((0,), (0,)), ((), ())),
                     preferred_element_type=jnp.float32)
    # NO K-stack / output-pack concats (same finding as the gram dots:
    # dot count is a non-factor, operand materializations are not):
    # each 3-pass product runs as its hh + hl + lh term dots directly
    th_r, tl_r = split2(a_re[:, n:])                  # (BPB, NK, T)
    th_i, tl_i = split2(a_im[:, n:])
    gh_r, gl_r = split2(gp_re)                        # (BPB, NK, 8)
    gh_i, gl_i = split2(gp_im)
    if passes != 3:
        tl_r = tl_i = gl_r = gl_i = None

    def prod3(gh, gl, th, tl, b_i):
        """3-pass (or 1-pass) g^T t: (8, T) f32."""
        out = dot_tn(gh[b_i], th[b_i])
        if tl is not None:
            out = out + dot_tn(gh[b_i], tl[b_i]) + dot_tn(gl[b_i],
                                                          th[b_i])
        return out

    pr, pi = [], []
    for b_i in range(_BPB):
        # (a + bi)(c - di): re = ac + bd, im = bc - ad   [conj on G]
        pr.append(prod3(gh_r, gl_r, th_r, tl_r, b_i)
                  + prod3(gh_i, gl_i, th_i, tl_i, b_i))
        pi.append(prod3(gh_r, gl_r, th_i, tl_i, b_i)
                  - prod3(gh_i, gl_i, th_r, tl_r, b_i))
    pr = jnp.stack(pr, axis=0)
    pi = jnp.stack(pi, axis=0)
    return cur_re - pr, cur_im - pi


def _lambda_weights_block(d_re, d_im, n, context, t):
    """Context-smoothed mean power -> sqrt(1/lambda): (BPB, 1, T)."""
    power = jnp.sum(d_re * d_re + d_im * d_im, axis=1,
                    keepdims=True) * (1.0 / n)        # (BPB, 1, T)
    if context > 0:
        iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, t), 2)
        acc = power
        counts = jnp.ones((1, 1, t), jnp.float32)
        for c in range(1, context + 1):
            acc = acc + _shift_blk(power, c, t)       # p[t - c]
            acc = acc + jnp.pad(power[..., c:],
                                ((0, 0), (0, 0), (0, c)))  # p[t + c]
            counts = counts + (iota >= c).astype(jnp.float32)
            counts = counts + (iota < t - c).astype(jnp.float32)
        power = acc / counts
    return jax.lax.rsqrt(jnp.maximum(power, EPSILON))


def _split3(x):
    """THREE-term bf16 split (x = h + m + l): the 2-term 3-pass form's
    sqrt(T)-accumulated error (~7e-4 max rel at T=501) forced a
    8e-6*NK loading floor on the solve, and THAT loading cost ~20 dB
    of golden parity on real speech (the WPE filter shift is
    O(eps * cond)).  The 3-term split restores ~f32-grade entries
    (missing terms are <= 2^-24 relative) for ~0.5 ms more MXU —
    the solve runs the plain 1e-6 hermitian loading, matching the XLA
    path bit-for-policy (doc/KERNELS.md round-3 resolution)."""
    h = x.astype(jnp.bfloat16)
    rem = x - h.astype(jnp.float32)
    m = rem.astype(jnp.bfloat16)
    l = (rem - m.astype(jnp.float32)).astype(jnp.bfloat16)
    return h, m, l


def _wpe_gram_kernel(n, taps, delay, context, use_g, ext_lambda,
                     debug,
                     obs_re_ref, obs_im_ref, g_re_ref, g_im_ref, lam_ref,
                     gram_re_ref, gram_im_ref):
    t = obs_re_ref.shape[-1]
    cols = (taps + 1) * n
    dot_nt = partial(jax.lax.dot_general,
                     dimension_numbers=(((1,), (1,)), ((), ())),
                     preferred_element_type=jnp.float32)
    # no zero-init needed: the output planes are exact-size (cols, cols)
    # and every element is stored below
    a_re, a_im = _design_blocks(obs_re_ref, obs_im_ref, taps, delay, t)
    if ext_lambda:
        # WPD: the power weights come from the enhanced output of the
        # previous outer iteration, supplied as an operand
        sw = jax.lax.rsqrt(
            jnp.maximum(lam_ref[...][:, None, :], EPSILON))
    else:
        if use_g:
            # NOTE: a passes=1 lambda was tried for ~1 ms/pass and
            # REVERTED: it cost 5 dB of golden WPE Si-SNR on chip
            # (43.4 -> 38.0 vs wpe_egs; fused-vs-XLA 56.3 -> 38.4) —
            # lambda feeds back through 3 solve iterations and the
            # bf16 1-pass dereverb error compounds (doc/KERNELS.md)
            d_re, d_im = _dereverb_block(a_re, a_im, g_re_ref, g_im_ref,
                                         n, taps, t, passes=3)
        else:
            # first iteration: d = the observations themselves
            d_re, d_im = a_re[:, :n], a_im[:, :n]
        sw = _lambda_weights_block(d_re, d_im, n, context, t)

    # This pass is MXU-BOUND: the executed (pad-inclusive) MACs of the
    # K-stacked gram dots are ~2.1e8 per bin, ~15 ms/pass at this
    # chip's bf16 rate — round-4 measured elementwise/issue
    # restructures FLAT (doc/KERNELS.md).  Two exact identities cut the
    # executed MACs ~38%:
    #   * Gram symmetry: for the SYMMETRIC products Ar Ar^T and
    #     Ai Ai^T, the 3-term split's cross passes satisfy
    #     X Y^T = (Y X^T)^T, so hh+mm rides ONE K=2T dot of [h|m]
    #     against itself and hm+hl+mh+lh comes from a K=2T dot
    #     [h|h]x[m|l] plus its transpose (6T -> 4T of K per plane);
    #   * only THREE of the four re/im products are needed:
    #     g_im = C - C^T with C = Ai Ar^T (Ar Ai^T = C^T exactly).
    # The results are exactly Hermitian by construction — no separate
    # symmetrize pass (the downstream planar solve consumes the planes
    # as-is; an XLA-side 0.5 (A + A^H) would cost an HBM round trip).
    aw_re = a_re * sw                                 # (BPB, cols, T)
    aw_im = a_im * sw
    hr, mr, lr = _split3(aw_re)
    hi, mi, li = _split3(aw_im)
    # NO K-stack concats: the 14 term products run as individual K=T
    # dots (identical executed MACs — concatenating operands only
    # reduces DOT COUNT, which measured flat at 32 vs 8 dots/block,
    # while the bf16 stack materializations were ~2-3 ms/pass of the
    # measured ~6 ms non-dot share; round-4 nodot attribution,
    # doc/KERNELS.md).
    if debug == "nodot":
        # PROFILING VARIANT (wrong math): consume every split plane
        # with SUBLANE-direction sums (the cheap reduction direction)
        # instead of the MXU dots — isolates the elementwise/layout +
        # DMA share of the pass.  (A first cut used LANE reductions and
        # measured SLOWER than the dots themselves — cross-lane sums
        # are the slow direction; doc/KERNELS.md round-1 covariance
        # lesson, re-learned.)
        for b_i in range(_BPB):
            r = (jnp.sum(hr[b_i], axis=0, keepdims=True)
                 + jnp.sum(mr[b_i], axis=0, keepdims=True)
                 + jnp.sum(lr[b_i], axis=0, keepdims=True))
            ci = (jnp.sum(hi[b_i], axis=0, keepdims=True)
                  + jnp.sum(mi[b_i], axis=0, keepdims=True)
                  + jnp.sum(li[b_i], axis=0, keepdims=True))
            gram_re_ref[b_i, 0:cols, 0:cols] = jnp.broadcast_to(
                r[:, :cols].astype(jnp.float32), (cols, cols))
            gram_im_ref[b_i, 0:cols, 0:cols] = jnp.broadcast_to(
                ci[:, :cols].astype(jnp.float32), (cols, cols))
        return
    for b_i in range(_BPB):
        def d(x, y, _b=b_i):
            return dot_nt(x[_b], y[_b])

        # re = Ar Ar^T + Ai Ai^T: symmetric terms hh + mm directly,
        # cross terms hm + hl once + transposed (X Y^T = (Y X^T)^T)
        p = d(hr, hr) + d(mr, mr) + d(hi, hi) + d(mi, mi)
        q = d(hr, mr) + d(hr, lr) + d(hi, mi) + d(hi, li)
        g_re = p + q + q.T
        # im = Ai Ar^T - Ar Ai^T = C - C^T (exactly antisymmetric);
        # C's 6-term split: hh + hm + hl + mh + mm + lh
        c = (d(hi, hr) + d(hi, mr) + d(hi, lr)
             + d(mi, hr) + d(mi, mr) + d(li, hr))
        g_im = c - c.T
        gram_re_ref[b_i, 0:cols, 0:cols] = g_re
        gram_im_ref[b_i, 0:cols, 0:cols] = g_im


def _wpe_apply_kernel(n, taps, delay, obs_re_ref, obs_im_ref, g_re_ref,
                      g_im_ref, d_re_ref, d_im_ref):
    t = obs_re_ref.shape[-1]
    a_re, a_im = _design_blocks(obs_re_ref, obs_im_ref, taps, delay, t)
    d_re, d_im = _dereverb_block(a_re, a_im, g_re_ref, g_im_ref, n,
                                 taps, t)
    # store only the n valid mic rows: this kernel is HBM-bound
    # (~400 MB obs read + d write per call) and the 8-row pad added
    # ~130 MB of dead write traffic
    d_re_ref[...] = d_re[:, :n]
    d_im_ref[...] = d_im[:, :n]


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
                                   "use_g", "interpret", "debug"))
def wpe_gram_pallas(obs_re, obs_im, g_re, g_im, n, taps, delay, context,
                    use_g=True, lam=None, interpret=False,
                    debug="full"):
    """Weighted [current | taps] Gram per bin.

    obs planar (BINS, N, T); g planar (BINS, N*taps, N) (ignored when
    ``use_g`` is False — first iteration).  ``lam`` (BINS, T) supplies
    EXTERNAL power weights (the WPD path, where lambda is the enhanced
    output power of the previous outer iteration) instead of the
    in-kernel context-smoothed dereverb power.  Returns gram planes
    (BINS, cols, cols) f32 with cols = (taps+1)*N
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
    cols = (taps + 1) * n
    # exact-size planes: the 72-pad added ~16% of dead traffic to an
    # HBM-heavy handoff (write + XLA bins->lanes transpose + solve read)
    out_spec = pl.BlockSpec((_BPB, cols, cols), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    gr, gi = pl.pallas_call(
        partial(_wpe_gram_kernel, n, taps, delay, context, use_g,
                ext_lambda, debug),
        grid=(binsp // _BPB,),
        in_specs=[obs_spec, obs_spec, g_spec, g_spec, lam_spec],
        out_specs=[out_spec, out_spec],
        out_shape=[jax.ShapeDtypeStruct((binsp, cols, cols),
                                        jnp.float32)] * 2,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(obs_re, obs_im, g_re, g_im, lam)
    return gr[:bins], gi[:bins]


@partial(jax.jit, static_argnames=("n", "taps", "delay", "interpret"))
def wpe_apply_pallas(obs_re, obs_im, g_re, g_im, n, taps, delay,
                     interpret=False):
    """Final filter application: d planes (BINS, N, T) f32."""
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
    out_spec = pl.BlockSpec((_BPB, n, t), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    dr, di = pl.pallas_call(
        partial(_wpe_apply_kernel, n, taps, delay),
        grid=(binsp // _BPB,),
        in_specs=[obs_spec, obs_spec, g_spec, g_spec],
        out_specs=[out_spec, out_spec],
        out_shape=[jax.ShapeDtypeStruct((binsp, n, t), jnp.float32)] * 2,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(obs_re, obs_im, g_re, g_im)
    return dr[:bins], di[:bins]
