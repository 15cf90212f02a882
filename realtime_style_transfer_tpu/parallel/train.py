"""Distributed (pjit/GSPMD) train & eval steps over a device mesh.

New TPU-native surface (the reference has no distributed training; SURVEY §2.6).
Strategy: params + optimizer state replicated, batch sharded over the ``data`` mesh
axis, optional activation H-axis sharding over ``spatial``.  The whole train step is
ONE jitted function; XLA inserts the gradient all-reduce (replicated-out params from
sharded-in batch) and conv halo exchanges (spatially-constrained activations)
automatically.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.training import StyleTransferTrainingModel, TrainState
from .mesh import DATA_AXIS, activation_spec, batch_sharding, replicated


class DistributedTrainer:
    """Wraps a ``StyleTransferTrainingModel`` with mesh-aware jitted steps."""

    def __init__(self, training_model: StyleTransferTrainingModel, mesh: Mesh):
        self.tm = training_model
        self.mesh = mesh
        self._act_spec = activation_spec(mesh)
        repl = replicated(mesh)
        batch_sh = batch_sharding(mesh)

        def constrain(batch):
            inputs, gt = batch
            inputs = dict(inputs)
            inputs["content"] = jax.lax.with_sharding_constraint(
                inputs["content"], NamedSharding(mesh, self._act_spec)
            )
            return inputs, gt

        def train_step(state: TrainState, batch):
            return self.tm.train_step(state, constrain(batch))

        def eval_step(state: TrainState, batch):
            return self.tm.eval_step(state, constrain(batch))

        self.train_step = jax.jit(
            train_step,
            in_shardings=(repl, batch_sh),
            out_shardings=(repl, repl),
            donate_argnums=(0,),
        )
        self.eval_step = jax.jit(
            eval_step, in_shardings=(repl, batch_sh), out_shardings=repl
        )

    # ---- host-side placement helpers ----------------------------------------

    def init_state(self, rng=None) -> TrainState:
        state = self.tm.init_state(rng)
        return jax.device_put(state, replicated(self.mesh))

    def shard_batch(self, batch):
        return jax.device_put(batch, batch_sharding(self.mesh))

    @property
    def data_parallelism(self) -> int:
        return self.mesh.shape[DATA_AXIS]
