"""Pallas TPU kernels: fused-sequence bidirectional LSTM (fwd + BPTT).

The XLA lax.scan BLSTM recurrence is latency-bound: at B=64, T=400,
H=512 each scan step costs ~17 us against ~2 us of MXU math, and the
backward pass doubles the sequential step count — the round-1 trainer
measured 12 steps/s with >80% of the step inside the recurrences
(doc/KERNELS.md).  These kernels run the WHOLE sequence inside one
pallas_call: grid=(T,) steps execute sequentially on the core, the
hidden/cell carries live in VMEM scratch across grid steps, the
recurrent weights stay VMEM-resident (constant index map), and the
per-step gate blocks stream through the double-buffered pipeline.
Both directions advance in the same grid step (forward direction at
block t=g, backward direction at t=T-1-g) so their matmuls pipeline
on the MXU.

The backward kernel re-derives the gate activations from the saved
(h, c) sequences instead of materializing the (T, B, 4H) activations
in the forward pass (one extra MXU matmul per step against ~420 MB of
HBM round trip at the bench shape).  The dW_h reduction is NOT in the
kernel: dW_h = h_prev^T dgates summed over T*B is one big XLA matmul
over the residuals, which the MXU does near peak — accumulating a
(H, 4H) f32 tile per grid step in VMEM measured as pure overhead.

Gradient math (gates order i, f, g, o as in models/mask_net.py):
  c_t = sig(f) c_{t-1} + sig(i) tanh(g),  h_t = sig(o) tanh(c_t)
  dh_t   = dy_t + W_h^T-path carry
  do~    = dh tanh(c) o(1-o)
  dc     = dc_carry + dh o (1 - tanh^2(c))
  di~    = dc tanh(g) i(1-i);  dg~ = dc i (1-tanh^2(g))
  df~    = dc c_{t-1} f(1-f);  dc_carry' = dc f
  dxg_t  = [di~ df~ dg~ do~];  dh_carry' = dxg_t W_h^T

Compute dtype follows the weight operands: the trainer passes bf16
weights/gates (f32 master params, same cast the XLA `_rec_matmul`
path applies) with f32 carries and f32 gate math in-kernel; the
parity tests pass f32 end to end under interpret mode.

Replaces the scan in models/mask_net.py FastLSTM (auto-dispatched on
the TPU target).  Reference delegates this training to Kaldi nnet3
BLSTM recipes (/root/reference/steps/train_rnn_mask.sh).
"""

import functools
from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["lstm_seq_bidir", "lstm_seq_supported"]


def lstm_seq_supported(batch: int, hidden: int) -> bool:
    """Static guard: tile-aligned shapes and a sane VMEM footprint."""
    return (batch % 8 == 0 and hidden % 128 == 0 and batch <= 1024
            and hidden <= 1024)


def _gate_split(gates, h):
    i = jax.nn.sigmoid(gates[:, :h])
    f = jax.nn.sigmoid(gates[:, h:2 * h])
    g = jnp.tanh(gates[:, 2 * h:3 * h])
    o = jax.nn.sigmoid(gates[:, 3 * h:])
    return i, f, g, o


def _fwd_kernel(hidden, xf_ref, xb_ref, wf_ref, wb_ref,
                hf_out, cf_out, hb_out, cb_out, hf, cf, hb, cb):
    from jax.experimental import pallas as pl
    g_idx = pl.program_id(0)

    @pl.when(g_idx == 0)
    def _init():
        for ref in (hf, cf, hb, cb):
            ref[...] = jnp.zeros_like(ref)

    def cell(xg_ref, w_ref, h_s, c_s, h_out, c_out):
        gates = xg_ref[0].astype(jnp.float32) + jnp.dot(
            h_s[...].astype(w_ref.dtype), w_ref[...],
            preferred_element_type=jnp.float32)
        i, f, g, o = _gate_split(gates, hidden)
        c_new = f * c_s[...] + i * g
        h_new = o * jnp.tanh(c_new)
        c_s[...] = c_new
        h_s[...] = h_new
        h_out[0] = h_new.astype(h_out.dtype)
        c_out[0] = c_new.astype(c_out.dtype)

    cell(xf_ref, wf_ref, hf, cf, hf_out, cf_out)
    cell(xb_ref, wb_ref, hb, cb, hb_out, cb_out)


def _bwd_kernel(hidden, dyf_ref, dyb_ref, xf_ref, xb_ref, cf_ref, cb_ref,
                hpf_ref, hpb_ref, cpf_ref, cpb_ref, wf_ref, wb_ref,
                wtf_ref, wtb_ref, dxf_out, dxb_out, dhf, dcf, dhb, dcb):
    from jax.experimental import pallas as pl
    g_idx = pl.program_id(0)

    @pl.when(g_idx == 0)
    def _init():
        for ref in (dhf, dcf, dhb, dcb):
            ref[...] = jnp.zeros_like(ref)

    def cell(dy_ref, xg_ref, c_ref, hp_ref, cp_ref, w_ref, wt_ref,
             dh_s, dc_s, dx_out):
        h_prev = hp_ref[0]
        gates = xg_ref[0].astype(jnp.float32) + jnp.dot(
            h_prev.astype(w_ref.dtype), w_ref[...],
            preferred_element_type=jnp.float32)
        i, f, g, o = _gate_split(gates, hidden)
        tc = jnp.tanh(c_ref[0].astype(jnp.float32))
        dh = dy_ref[0].astype(jnp.float32) + dh_s[...]
        do = dh * tc * o * (1.0 - o)
        dc = dc_s[...] + dh * o * (1.0 - tc * tc)
        di = dc * g * i * (1.0 - i)
        dg = dc * i * (1.0 - g * g)
        df = dc * cp_ref[0].astype(jnp.float32) * f * (1.0 - f)
        dc_s[...] = dc * f
        dgates = jnp.concatenate([di, df, dg, do], axis=-1)
        dx_out[0] = dgates.astype(dx_out.dtype)
        dh_s[...] = jnp.dot(dgates.astype(wt_ref.dtype), wt_ref[...],
                            preferred_element_type=jnp.float32)

    cell(dyf_ref, xf_ref, cf_ref, hpf_ref, cpf_ref, wf_ref, wtf_ref,
         dhf, dcf, dxf_out)
    cell(dyb_ref, xb_ref, cb_ref, hpb_ref, cpb_ref, wb_ref, wtb_ref,
         dhb, dcb, dxb_out)


@partial(jax.jit, static_argnames=("interpret",))
def _forward(xgf, xgb, whf, whb, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    t, b, h4 = xgf.shape
    h = h4 // 4
    fwd = lambda g: (g, 0, 0)
    rev = lambda g: (t - 1 - g, 0, 0)
    wmap = lambda g: (0, 0)
    store = xgf.dtype
    return pl.pallas_call(
        partial(_fwd_kernel, h),
        grid=(t,),
        in_specs=[pl.BlockSpec((1, b, h4), fwd),
                  pl.BlockSpec((1, b, h4), rev),
                  pl.BlockSpec((h, h4), wmap),
                  pl.BlockSpec((h, h4), wmap)],
        out_specs=[pl.BlockSpec((1, b, h), fwd),
                   pl.BlockSpec((1, b, h), fwd),
                   pl.BlockSpec((1, b, h), rev),
                   pl.BlockSpec((1, b, h), rev)],
        out_shape=[jax.ShapeDtypeStruct((t, b, h), store)] * 4,
        scratch_shapes=[pltpu.VMEM((b, h), jnp.float32)] * 4,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xgf, xgb, whf, whb)


@partial(jax.jit, static_argnames=("interpret",))
def _backward(dyf, dyb, xgf, xgb, csf, csb, hpf, hpb, cpf, cpb,
              whf, whb, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    t, b, h4 = xgf.shape
    h = h4 // 4
    fwd = lambda g: (g, 0, 0)
    rev = lambda g: (t - 1 - g, 0, 0)
    wmap = lambda g: (0, 0)
    # forward direction backprops in descending t (rev maps), backward
    # direction in ascending t (fwd maps) — each reverse of its own
    # processing order.
    seq_f = pl.BlockSpec((1, b, h), rev)
    seq_b = pl.BlockSpec((1, b, h), fwd)
    wtf = jnp.swapaxes(whf, 0, 1)
    wtb = jnp.swapaxes(whb, 0, 1)
    return pl.pallas_call(
        partial(_bwd_kernel, h),
        grid=(t,),
        in_specs=[seq_f, seq_b,
                  pl.BlockSpec((1, b, h4), rev),
                  pl.BlockSpec((1, b, h4), fwd),
                  seq_f, seq_b, seq_f, seq_b, seq_f, seq_b,
                  pl.BlockSpec((h, h4), wmap),
                  pl.BlockSpec((h, h4), wmap),
                  pl.BlockSpec((h4, h), wmap),
                  pl.BlockSpec((h4, h), wmap)],
        out_specs=[pl.BlockSpec((1, b, h4), rev),
                   pl.BlockSpec((1, b, h4), fwd)],
        out_shape=[jax.ShapeDtypeStruct((t, b, h4), xgf.dtype)] * 2,
        scratch_shapes=[pltpu.VMEM((b, h), jnp.float32)] * 4,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(dyf, dyb, xgf, xgb, csf, csb, hpf, hpb, cpf, cpb,
      whf, whb, wtf, wtb)


@functools.lru_cache(maxsize=2)
def _bidir_fn(interpret):
    @jax.custom_vjp
    def fn(xgf, xgb, whf, whb):
        ysf, _, ysb, _ = _forward(xgf, xgb, whf, whb, interpret)
        return ysf, ysb

    def fwd(xgf, xgb, whf, whb):
        ysf, csf, ysb, csb = _forward(xgf, xgb, whf, whb, interpret)
        return (ysf, ysb), (xgf, xgb, whf, whb, ysf, ysb, csf, csb)

    def bwd(res, cts):
        xgf, xgb, whf, whb, ysf, ysb, csf, csb = res
        dyf, dyb = cts
        t = xgf.shape[0]
        zrow_h = jnp.zeros_like(ysf[:1])
        zrow_c = jnp.zeros_like(csf[:1])
        # processing-order previous states (h_{-1} = c_{-1} = 0):
        # forward direction shifts down in natural time, backward
        # direction (which processed t in descending order) shifts up.
        hpf = jnp.concatenate([zrow_h, ysf[:t - 1]], axis=0)
        cpf = jnp.concatenate([zrow_c, csf[:t - 1]], axis=0)
        hpb = jnp.concatenate([ysb[1:], zrow_h], axis=0)
        cpb = jnp.concatenate([csb[1:], zrow_c], axis=0)
        dxf, dxb = _backward(dyf.astype(ysf.dtype), dyb.astype(ysb.dtype),
                             xgf, xgb, csf, csb, hpf, hpb, cpf, cpb,
                             whf, whb, interpret)
        b, h = ysf.shape[1], ysf.shape[2]

        def dwh(hp, dx):
            return jax.lax.dot_general(
                hp.reshape(t * b, h), dx.reshape(t * b, 4 * h),
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        return (dxf, dxb, dwh(hpf, dxf).astype(whf.dtype),
                dwh(hpb, dxb).astype(whb.dtype))

    fn.defvjp(fwd, bwd)
    return fn


def lstm_seq_bidir(xgf, xgb, whf, whb, interpret: bool = False):
    """Bidirectional LSTM over pre-projected gates, fused per direction.

    xgf / xgb: (T, B, 4H) time-major gate pre-activations (input
    projection W_x x + bias, gates ordered i|f|g|o) for the forward /
    backward direction, BOTH in natural time order; whf / whb: (H, 4H)
    recurrent weights.  Returns (ys_f, ys_b), each (T, B, H) in natural
    time order (ys_b[t] is the backward-direction state after it has
    consumed frames T-1..t).  Differentiable via a hand-written BPTT
    kernel pair (see module docstring).
    """
    return _bidir_fn(interpret)(xgf, xgb, whf, whb)
