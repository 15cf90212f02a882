"""Distributed inference: shard frame batches (and optionally H) over the mesh.

New TPU-native surface (the reference is single-GPU).  Two regimes:

* offline/batched (video re-stylization): frames sharded over the ``data`` axis —
  linear throughput scaling, no collectives at all (style params replicated).
* latency-bound single frame: activations sharded over ``spatial`` (H axis);
  GSPMD inserts conv halo exchanges on ICI.
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.inference import StyleTransferInference
from .mesh import DATA_AXIS, activation_spec, batch_sharding, replicated


class DistributedStylizer:
    """Mesh-aware jitted ``stylize`` / ``predict_style_params`` wrappers."""

    def __init__(self, model: StyleTransferInference, variables, mesh: Mesh):
        self.model = model
        self.mesh = mesh
        repl = replicated(mesh)
        batch_sh = batch_sharding(mesh)
        act = NamedSharding(mesh, activation_spec(mesh))
        self.variables = jax.device_put(variables, repl)

        def stylize(variables, content, style_params, style_weights=None):
            content = jax.lax.with_sharding_constraint(content, act)
            kwargs = {}
            if style_weights is not None:
                kwargs["style_weights"] = style_weights
            return model.apply(
                variables, content, style_params, method=model.stylize, **kwargs
            )

        self._stylize = jax.jit(
            stylize,
            in_shardings=(repl, batch_sh, repl, None),
            out_shardings=batch_sh,
        )
        self._predict_params = jax.jit(
            lambda v, s: model.apply(v, s, method=model.predict_style_params),
            in_shardings=(repl, repl),
            out_shardings=repl,
        )

    def predict_style_params(self, style_images):
        return self._predict_params(self.variables, style_images)

    def stylize(self, content, style_params, style_weights=None):
        """content (B, H, W, C) with B divisible by the data-axis size."""
        return self._stylize(self.variables, content, style_params, style_weights)

    @property
    def batch_per_step(self) -> int:
        return self.mesh.shape[DATA_AXIS]
