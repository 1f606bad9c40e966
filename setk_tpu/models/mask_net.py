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

__all__ = ["MaskNet", "make_model", "quadratic_loss"]


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
            # unroll=8: the recurrence is latency-bound on small
            # sequential matmuls; unrolling lets XLA pipeline them
            for _ in range(self.num_layers):
                fwd = nn.RNN(nn.OptimizedLSTMCell(self.hidden), unroll=8)
                if self.arch == "blstm":
                    bwd = nn.RNN(nn.OptimizedLSTMCell(self.hidden),
                                 reverse=True, keep_order=True, unroll=8)
                    x = jnp.concatenate([fwd(x), bwd(x)], axis=-1)
                else:
                    x = fwd(x)
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
