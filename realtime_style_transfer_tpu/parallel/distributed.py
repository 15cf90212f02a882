"""Multi-host (multi-slice) initialization and cross-host input sharding.

New TPU-native surface (SURVEY §5: the reference has no distributed backend).
Single-slice multi-chip needs nothing beyond a mesh (ICI collectives are inserted
by GSPMD); crossing hosts/slices requires ``jax.distributed.initialize`` before
any backend touch — this module wraps that plus the per-host batch split the data
plane needs.

Untested against real DCN in this environment (one physical chip; see ROADMAP.md);
the single-host degenerate path is exercised by the test suite.
"""

from __future__ import annotations

import logging
from typing import Optional

import jax

log = logging.getLogger(__name__)


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Initialize multi-host JAX (no-op on a single process).

    With no arguments, relies on the cluster environment (TPU pod metadata /
    JAX_COORDINATOR_ADDRESS). Must run before any jax backend use.
    """
    if num_processes is not None and num_processes <= 1:
        log.info("single process: skipping jax.distributed.initialize")
        return
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)
    log.info("jax.distributed initialized: process %d / %d",
             jax.process_index(), jax.process_count())


def host_batch_slice(global_batch_size: int) -> slice:
    """This host's slice of a globally-indexed batch (per-host input pipeline).

    Each host loads only its shard of every global batch; combined with
    ``jax.make_array_from_process_local_data`` the trainer sees one logical
    array. (Reference counterpart: none — single process.)
    """
    per_host = global_batch_size // jax.process_count()
    if per_host * jax.process_count() != global_batch_size:
        raise ValueError(
            f"global batch {global_batch_size} not divisible by "
            f"{jax.process_count()} processes"
        )
    start = jax.process_index() * per_host
    return slice(start, start + per_host)


def global_array_from_host_batch(mesh, host_batch):
    """Assemble a globally-sharded array from this host's local batch shard."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P("data"))
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sharding, x), host_batch
    )
