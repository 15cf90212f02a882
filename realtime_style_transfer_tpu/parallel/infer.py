"""Distributed inference: shard frame batches (and optionally H) over the mesh.

New TPU-native surface (the reference is single-GPU).  Three regimes:

* offline/batched (video re-stylization): frames sharded over the ``data`` axis —
  linear throughput scaling, no collectives at all (style params replicated).
* latency-bound single frame: activations sharded over ``spatial`` (H axis);
  GSPMD inserts conv halo exchanges on ICI.
* **production streaming** (:class:`FusedStreamStylizer`): the single-chip
  557-FPS whole-net fused Pallas kernel (or the XLA packed path where the plan
  doesn't qualify) IS the per-chip program, run under ``shard_map`` with one
  frame per chip per step and the prepared style constants replicated — the
  fast path and the scaling path are the same code.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.inference import StyleTransferInference
from ..models.transfer import TransferPlan
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


class FusedStreamStylizer:
    """Frames over the ``data`` axis; the fused kernel as the per-chip program.

    Each step consumes ``n_data`` frames (one per chip — the fused kernel is a
    batch-1 whole-net ``pallas_call``; batch>1 per chip is an XLA lowering
    pathology, ``docs/batch_scaling.md``).  The style table / weight mips are
    prepared once (reference ``predict_video_using_checkpoint.py:77-80``
    hoists style params the same way) and replicated; there are no collectives
    — throughput scales linearly over ICI-connected chips.

    ``path='auto'`` uses the fused kernel when the plan qualifies AND a real
    accelerator backs the mesh, else the XLA packed path (same fallback rule
    as ``predict_video --path auto`` — interpret-mode Pallas is Python-speed,
    so auto never selects it on CPU; ``path='fused'`` still forces it, which
    is what tests/dryruns use).
    """

    def __init__(self, variables, plan: TransferPlan, mesh: Mesh, *,
                 num_styles: int = 1, path: str = "auto",
                 interpret: bool = False, dtype=jnp.bfloat16,
                 quant=None, act_scales=None):
        if quant is not None and path != "fused":
            raise ValueError("quant engines exist only on the fused path; "
                             "pass path='fused'")
        if mesh.shape.get("spatial", 1) != 1:
            raise ValueError(
                "FusedStreamStylizer shards whole frames over the data axis; "
                "build the mesh with spatial=1")
        self.mesh = mesh
        self.num_styles = num_styles
        self.n_data = mesh.shape[DATA_AXIS]
        repl = replicated(mesh)
        batch = NamedSharding(mesh, P(DATA_AXIS))

        self._fused = None
        want_fused = path == "fused" or (
            path == "auto"
            and not interpret
            and jax.devices()[0].platform not in ("cpu",)
        )
        if want_fused:
            from ..ops.pallas.fused_transfer import FusedTransfer

            try:
                self._fused = FusedTransfer(
                    jax.device_get(variables), plan, num_styles=num_styles,
                    interpret=interpret, quant=quant, act_scales=act_scales)
            except ValueError:
                if path == "fused":
                    raise
        self.path = "fused" if self._fused is not None else "packed"

        if self._fused is not None:
            fused = self._fused

            def per_chip(content, prepared):
                return fused._forward_prepared(content, prepared)

            def per_chip_prepacked(packed, prepared):
                # shard (1, hp, wp, Cp): pre-packed by the data plane
                # (FusedTransfer.pack_frame_np), same deploy contract as the
                # single-chip path.
                return fused._unpack_out(fused._run_packed(packed[0], prepared))

            self._prepare = jax.jit(fused._prepare, out_shardings=repl)
            # check_vma=False: pallas_call's ShapeDtypeStruct outputs carry no
            # varying-across-mesh annotation; the kernel is per-chip local.
            self._stylize = jax.jit(
                shard_map(per_chip, mesh=mesh,
                          in_specs=(P(DATA_AXIS), P()),
                          out_specs=P(DATA_AXIS), check_vma=False),
                in_shardings=(batch, repl), out_shardings=batch)
            self._stylize_prepacked = jax.jit(
                shard_map(per_chip_prepacked, mesh=mesh,
                          in_specs=(P(DATA_AXIS), P()),
                          out_specs=P(DATA_AXIS), check_vma=False),
                in_shardings=(batch, repl), out_shardings=batch)
        else:
            from ..models.transfer_packed import stylize_packed

            self.variables = jax.device_put(variables, repl)

            def prepare(style_params, style_weights=None):
                return (style_params,) + (
                    (style_weights,) if style_weights is not None else ())

            def per_chip_packed(variables, content, prepared):
                style_params = prepared[0]
                weights = prepared[1] if len(prepared) > 1 else None
                return stylize_packed(variables, content, style_params,
                                      weights, plan=plan, dtype=dtype)

            self._prepare = jax.jit(prepare, out_shardings=repl)
            self._stylize_packed = jax.jit(
                shard_map(per_chip_packed, mesh=mesh,
                          in_specs=(P(), P(DATA_AXIS), P()),
                          out_specs=P(DATA_AXIS)),
                in_shardings=(repl, batch, repl), out_shardings=batch)

    def prepare_style(self, style_params, style_weights=None):
        """Replicated per-style device constants for the frame stream."""
        if self.num_styles > 1 and style_weights is None:
            raise ValueError("style_weights required when num_styles > 1")
        if style_weights is None:
            return self._prepare(style_params)
        return self._prepare(style_params, style_weights)

    def stylize_batch(self, content, prepared):
        """content (n_data, H, W, C) -> (n_data, H, W, 3); one frame per chip."""
        if content.shape[0] != self.n_data:
            raise ValueError(
                f"need exactly {self.n_data} frames per step "
                f"(one per chip), got {content.shape[0]}")
        if self.path == "fused":
            return self._stylize(content, prepared)
        return self._stylize_packed(self.variables, content, prepared)

    def pack_frames_np(self, frames):
        """Host-pack an (n_data, H, W, C) group for :meth:`stylize_batch_prepacked`
        (fused path only; numpy, safe in a DevicePrefetcher worker)."""
        import numpy as np

        if self._fused is None:
            raise ValueError("pre-packed input is a fused-path contract")
        return np.stack([
            self._fused.pack_frame_np(frames[i:i + 1])
            for i in range(frames.shape[0])
        ])

    def stylize_batch_prepacked(self, packed, prepared):
        """Pre-packed (n_data, hp, wp, Cp) group -> (n_data, H, W, 3)."""
        if self._fused is None:
            raise ValueError("pre-packed input is a fused-path contract")
        if packed.shape[0] != self.n_data:
            raise ValueError(
                f"need exactly {self.n_data} frames per step "
                f"(one per chip), got {packed.shape[0]}")
        return self._stylize_prepacked(packed, prepared)

    @property
    def batch_per_step(self) -> int:
        return self.n_data

    @property
    def fused_engine(self):
        """The per-chip FusedTransfer (None on the packed fallback) — e.g.
        for single-chip int8 calibration, whose scales transfer to the mesh."""
        return self._fused
