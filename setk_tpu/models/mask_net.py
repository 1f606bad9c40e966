"""Neural T-F mask estimators (DNN / TDNN / CNN-TDNN / LSTM / BLSTM).

The reference delegates mask-estimator training to Kaldi nnet3 recipes
(/root/reference/steps/train_dnn_mask.sh, train_rnn_mask.sh: DNN/TDNN/
CNN-TDNN/[B]LSTM stacks with a sigmoid output of dim = num_bins and a
quadratic objective).  This module provides the same model families as
native flax modules trained directly on TPU: input is the log-magnitude
spectrogram (B, T, F), output a sigmoid mask (B, T, F); the objective is
the frame-masked quadratic loss against oracle masks (compute_mask).
"""

from dataclasses import dataclass, field
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from setk_tpu.ops.pallas.lstm_seq import lstm_seq_bidir, lstm_seq_supported
from setk_tpu.utils.hostdev import tpu_target

__all__ = ["MaskNet", "make_model", "quadratic_loss"]

# test hook: force the fused-sequence kernel path (interpret mode) on CPU
_KERNEL_TEST_MODE = False


def _shifted_frames(x, offsets):
    """Edge-clamped time-shifted copies via ONE edge pad + static slices.

    The earlier clipped-index gather formulation backpropagates as
    scatter-adds — measured ~10x of a DNN training step's time on TPU;
    pad+slice differentiates as slice+pad (streaming copies)."""
    t = x.shape[-2]
    left = max(-min(offsets), 0)
    right = max(max(offsets), 0)
    pad = [(0, 0)] * (x.ndim - 2) + [(left, right), (0, 0)]
    xp = jnp.pad(x, pad, mode="edge")
    return [xp[..., off + left:off + left + t, :] for off in offsets]


class SpliceFrames(nn.Module):
    """Context splicing: concat [-left, +right] neighbor frames."""
    left: int = 2
    right: int = 2

    @nn.compact
    def __call__(self, x):
        # x: (B, T, F)
        offs = list(range(-self.left, self.right + 1))
        return jnp.concatenate(_shifted_frames(x, offs), axis=-1)


def _lstm_gates(gates, c):
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    c = nn.sigmoid(f) * c + nn.sigmoid(i) * jnp.tanh(g)
    h = nn.sigmoid(o) * jnp.tanh(c)
    return h, c


def _rec_matmul(h, wh):
    """Recurrent h @ W_h in bf16 with f32 accumulation.

    The cell state stays f32; the mask-estimation objective is far above
    bf16 noise (the nnet3 recipes the reference delegates to train in
    lower precision too)."""
    return jax.lax.dot(h.astype(jnp.bfloat16), wh.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)


class FastLSTM(nn.Module):
    """LSTM layer built for the MXU (uni- or bi-directional).

    flax's nn.RNN(OptimizedLSTMCell) issues the full (in+hidden) gate
    matmul inside every scan step, so the whole input projection runs
    as T sequential latency-bound matmuls (the round-1 BLSTM trained at
    13 steps/s).  Three restructurings:
      * the input half x W_x of all gates is ONE time-parallel
        (B*T, in) x (in, 4H) matmul outside the recurrence;
      * bidirectional = BOTH directions inside one scan step (their
        recurrent matmuls are independent, so the MXU pipelines them)
        instead of two full sequential scans;
      * the recurrent matmul runs bf16 with f32 accumulation.
    Same math as the standard LSTM (and the nnet3 lstm layers the
    reference delegates to, /root/reference/steps/train_rnn_mask.sh).

    On the TPU target the bidirectional recurrence runs as ONE fused
    Pallas sequence kernel per pass (ops/pallas/lstm_seq.py: carries in
    VMEM scratch across a grid=(T,) pipeline, hand-written BPTT) — the
    XLA scan is latency-bound at ~17 us/sequential step and the kernel
    removes ~4800 of those per training step at the bench shape.
    """
    hidden: int
    bidirectional: bool = False
    unroll: int = 16
    time_major: bool = False  # x is (T, B, F); saves per-layer swaps

    @nn.compact
    def __call__(self, x):
        b = x.shape[1] if self.time_major else x.shape[0]
        h4 = 4 * self.hidden
        use_kernel = self.bidirectional and (
            _KERNEL_TEST_MODE
            or (lstm_seq_supported(b, self.hidden) and tpu_target()))
        # on the fused-kernel path the projections compute in bf16 (f32
        # params): XLA's f32 matmuls on TPU already run single-pass
        # bf16, so this only drops the f32 activation traffic
        cd = jnp.bfloat16 if use_kernel and not _KERNEL_TEST_MODE else None
        # time-parallel input projections (carry the biases)
        xg_f = nn.Dense(h4, name="wx_f", dtype=cd)(x)
        wh_f = self.param("wh_f", nn.initializers.orthogonal(),
                          (self.hidden, h4))
        h0 = jnp.zeros((b, self.hidden), x.dtype)

        def to_tmajor(a):
            return a if self.time_major else jnp.swapaxes(a, 0, 1)

        def from_tmajor(a):
            return a if self.time_major else jnp.swapaxes(a, 0, 1)

        if not self.bidirectional:
            def step(carry, xg_t):
                h, c = carry
                h, c = _lstm_gates(xg_t + _rec_matmul(h, wh_f), c)
                return (h, c), h

            (_, _), ys = jax.lax.scan(step, (h0, h0), to_tmajor(xg_f),
                                      unroll=self.unroll)
            return from_tmajor(ys)

        xg_b = nn.Dense(h4, name="wx_b", dtype=cd)(x)
        wh_b = self.param("wh_b", nn.initializers.orthogonal(),
                          (self.hidden, h4))
        if use_kernel:
            if _KERNEL_TEST_MODE:
                ys_f, ys_b = lstm_seq_bidir(to_tmajor(xg_f),
                                            to_tmajor(xg_b),
                                            wh_f, wh_b, interpret=True)
            else:
                # bf16 gates/weights with f32 carries — the same cast
                # _rec_matmul applies on the scan path
                ys_f, ys_b = lstm_seq_bidir(to_tmajor(xg_f),
                                            to_tmajor(xg_b),
                                            wh_f.astype(cd),
                                            wh_b.astype(cd))
            ys = jnp.concatenate([ys_f, ys_b], axis=-1).astype(x.dtype)
            return from_tmajor(ys)

        # NEGATIVE RESULT (measured on chip, B=64 T=400 H=512): fusing
        # the two directions into one blockdiag (B, 2H) x (2H, 8H) dot
        # per step ran 100 ms/train-step vs 83 for this form — the 2x
        # wasted MACs beat the saved launch latency.  The recurrence is
        # irreducibly latency-bound at this batch (17 us/step forward
        # against ~2 us of MXU math); the Pallas path above is how it
        # actually gets fast.

        def step(carry, xs):
            hf, cf, hb, cb = carry
            xf_t, xb_t = xs
            hf, cf = _lstm_gates(xf_t + _rec_matmul(hf, wh_f), cf)
            hb, cb = _lstm_gates(xb_t + _rec_matmul(hb, wh_b), cb)
            return (hf, cf, hb, cb), (hf, hb)

        xs = (to_tmajor(xg_f), jnp.flip(to_tmajor(xg_b), axis=0))
        _, (ys_f, ys_b) = jax.lax.scan(step, (h0, h0, h0, h0), xs,
                                       unroll=self.unroll)
        ys = jnp.concatenate([ys_f, jnp.flip(ys_b, axis=0)], axis=-1)
        return from_tmajor(ys)


class TdnnBlock(nn.Module):
    """Sub-sampled time-dilated affine + ReLU (TDNN layer)."""
    dim: int
    dilation: int = 1

    @nn.compact
    def __call__(self, x):
        ctx = _shifted_frames(x, (-self.dilation, 0, self.dilation))
        x = jnp.concatenate(ctx, axis=-1)
        x = nn.Dense(self.dim)(x)
        return nn.relu(nn.LayerNorm()(x))


class MaskNet(nn.Module):
    """Sigmoid T-F mask estimator over log-magnitude inputs."""
    arch: str = "dnn"  # dnn | tdnn | cnn-tdnn | lstm | blstm
    num_bins: int = 257
    hidden: int = 512
    num_layers: int = 3
    context: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: (B, T, F) log-magnitude
        x = nn.LayerNorm()(x)
        if self.arch == "dnn":
            x = SpliceFrames(self.context, self.context)(x)
            for _ in range(self.num_layers):
                x = nn.relu(nn.LayerNorm()(nn.Dense(self.hidden)(x)))
        elif self.arch == "tdnn":
            x = nn.relu(nn.Dense(self.hidden)(x))
            for i in range(self.num_layers):
                x = TdnnBlock(self.hidden, dilation=2**i)(x)
        elif self.arch == "cnn-tdnn":
            # 2D conv front-end over (time, freq), then TDNN stack —
            # same shape as the reference's cnn xconfig
            # (steps/train_dnn_mask.sh:82-95: 5 conv-relu-batchnorm
            # layers with a height subsample, then relu-renorm layers).
            # LayerNorm replaces batchnorm: stateless, fuses on TPU.
            h = x[..., None]  # (B, T, F, 1)
            for filters, f_stride in ((32, 1), (32, 1), (64, 2), (32, 1)):
                h = nn.Conv(filters, (3, 3), strides=(1, f_stride))(h)
                h = nn.relu(nn.LayerNorm()(h))
            x = h.reshape(h.shape[:-2] + (h.shape[-2] * h.shape[-1],))
            for i in range(self.num_layers):
                x = TdnnBlock(self.hidden, dilation=2**i)(x)
        elif self.arch in ("lstm", "blstm"):
            # one time-major conversion for the whole stack: every
            # layer (scan or fused kernel) consumes and produces
            # (T, B, ·), so the per-layer (B,T,4H) transposes vanish
            x = jnp.swapaxes(x, 0, 1)
            if (self.arch == "blstm" and not _KERNEL_TEST_MODE
                    and tpu_target()
                    and lstm_seq_supported(x.shape[1], self.hidden)):
                # keep inter-layer activations bf16 on the kernel path
                # (the output head below restores f32)
                x = x.astype(jnp.bfloat16)
            for _ in range(self.num_layers):
                x = FastLSTM(self.hidden,
                             bidirectional=self.arch == "blstm",
                             time_major=True)(x)
            x = jnp.swapaxes(x, 0, 1)
        else:
            raise ValueError(f"Unknown arch: {self.arch}")
        return nn.sigmoid(nn.Dense(self.num_bins)(x))


def make_model(arch: str = "dnn", num_bins: int = 257, hidden: int = 512,
               num_layers: int = 3) -> MaskNet:
    return MaskNet(arch=arch, num_bins=num_bins, hidden=hidden,
                   num_layers=num_layers)


def quadratic_loss(pred, target, frame_mask=None):
    """Mean squared error, ignoring padded frames.

    pred/target: (B, T, F); frame_mask: (B, T) 1 for valid frames.
    """
    err = (pred - target)**2
    if frame_mask is None:
        return jnp.mean(err)
    weights = frame_mask[..., None]
    return jnp.sum(err * weights) / jnp.maximum(
        jnp.sum(weights) * pred.shape[-1], 1.0)
