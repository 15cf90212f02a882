"""Device-mesh construction and sharding rules.

The reference is single-process/single-GPU (SURVEY §2.6: no distribution machinery
exists there — device setup is a VRAM cap at ``train_network.py:14-23``).  This
module is new, TPU-native surface: a 2D ``(data, spatial)`` mesh where

* ``data``    — batch-axis data parallelism; the only training-time collective is
  the gradient all-reduce XLA inserts because params are replicated and the batch
  is sharded (rides ICI within a slice).
* ``spatial`` — optional sharding of the activation H axis for the 960x1920-class
  frames (the CP analog from SURVEY §5): GSPMD inserts conv halo exchanges
  automatically when convolution inputs carry a spatial sharding constraint.

Everything is plain ``jax.sharding``: pick a mesh, annotate, let XLA insert
collectives.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SPATIAL_AXIS = "spatial"


def make_mesh(
    n_devices: Optional[int] = None,
    *,
    spatial: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ``(data, spatial)`` mesh over the available devices.

    ``spatial`` divides the device count; the rest goes to ``data``.
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(
                f"requested a {n_devices}-device mesh but only "
                f"{len(devices)} device(s) are visible (for CPU dry runs "
                "set XLA_FLAGS=--xla_force_host_platform_device_count=N)")
        devices = devices[:n_devices]
    n = len(devices)
    if n % spatial != 0:
        raise ValueError(f"{n} devices not divisible by spatial={spatial}")
    grid = np.asarray(devices).reshape(n // spatial, spatial)
    return Mesh(grid, (DATA_AXIS, SPATIAL_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def activation_spec(mesh: Mesh) -> P:
    """(B, H, W, C) activations: batch over data, H over spatial."""
    if mesh.shape.get(SPATIAL_AXIS, 1) > 1:
        return P(DATA_AXIS, SPATIAL_AXIS)
    return P(DATA_AXIS)


def shard_batch(batch, mesh: Mesh):
    """Place a host batch pytree onto the mesh, sharded on the leading axis."""
    sharding = batch_sharding(mesh)
    return jax.device_put(batch, sharding)


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (params/optimizer state) across the mesh."""
    return jax.device_put(tree, replicated(mesh))
