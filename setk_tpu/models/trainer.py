"""Mask-estimator training: jitted/data-parallel steps + checkpoint IO.

Replaces the reference's delegation to Kaldi nnet3
(/root/reference/steps/train_dnn_mask.sh:102-108) with native TPU
training: optax Adam over the quadratic mask objective, batches sharded
over the mesh ``data`` axis (gradient all-reduce inserted by the jit
partitioner), msgpack checkpoints via flax.serialization.
"""

from dataclasses import dataclass
from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import serialization

from setk_tpu.models.mask_net import MaskNet, make_model, quadratic_loss
from setk_tpu.utils.logger import get_logger

logger = get_logger(__name__)

__all__ = ["MaskTrainer", "save_checkpoint", "load_checkpoint"]


def save_checkpoint(path, params, meta: dict):
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    blob = serialization.to_bytes({"params": params})
    path.write_bytes(blob)
    import json
    Path(str(path) + ".json").write_text(json.dumps(meta, indent=2))
    logger.info(f"Saved checkpoint to {path}")


def load_checkpoint(path):
    import json
    path = Path(path)
    meta = json.loads(Path(str(path) + ".json").read_text())
    model = make_model(arch=meta["arch"], num_bins=meta["num_bins"],
                       hidden=meta["hidden"], num_layers=meta["num_layers"])
    # template params for deserialization
    rng = jax.random.PRNGKey(0)
    template = model.init(rng, jnp.zeros((1, 8, meta["num_bins"])))
    state = serialization.from_bytes({"params": template["params"]},
                                     path.read_bytes())
    return model, state["params"], meta


class MaskTrainer:
    """Adam training of a MaskNet on (log-spec, target-mask) batches."""

    def __init__(self, model: MaskNet, lr: float = 1e-3, mesh=None,
                 seed: int = 0):
        self.model = model
        self.mesh = mesh
        rng = jax.random.PRNGKey(seed)
        params = model.init(rng, jnp.zeros((1, 8, model.num_bins)))["params"]
        self.tx = optax.adam(lr)
        self.params = params
        self.opt_state = self.tx.init(params)
        self._step = self._build_step()

    def _build_step(self):
        def step(params, opt_state, feats, targets, frame_mask):
            def loss_fn(p):
                pred = self.model.apply({"params": p}, feats)
                return quadratic_loss(pred, targets, frame_mask)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            data = NamedSharding(self.mesh, P("data"))
            rep = NamedSharding(self.mesh, P())
            return jax.jit(step,
                           in_shardings=(rep, rep, data, data, data),
                           out_shardings=(rep, rep, rep))
        return jax.jit(step)

    def train_batch(self, feats, targets, frame_mask):
        """One step over (B, T, F) float32 arrays; returns the loss."""
        self.params, self.opt_state, loss = self._step(
            self.params, self.opt_state, feats, targets, frame_mask)
        return float(loss)

    def predict(self, feats):
        return self.model.apply({"params": self.params}, feats)
