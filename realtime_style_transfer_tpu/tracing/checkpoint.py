"""Checkpoint/resume via Orbax: epoch-cadence + latest aliases + weights export.

Re-design of the reference's ``CheckpointCallback`` (``tracing/checkpoint.py:5-37``),
which kept two tf.train.CheckpointManagers — ``ckpt`` every N epochs keep-5 and
``latest_ckpt`` keep-1 — plus a ``save_weights`` file for the predict scripts.  Here:

* ``ckpt/``        — every ``cadence`` epochs, keep 5 (Orbax CheckpointManager)
* ``latest_ckpt/`` — every epoch, keep 1
* ``weights/``     — params+batch_stats only (no optimizer state), the artifact the
  inference tools load (reference ``predict_using_checkpoint.py:84`` role)

All three hold the same pytree layout, so "object checkpoint" vs "weights file"
restore conventions collapse into one format with an optional optimizer section.
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp

log = logging.getLogger(__name__)

WEIGHTS_NAME = "weights"


class CheckpointManager:
    def __init__(self, log_dir, *, cadence: int = 10, keep: int = 5):
        self.log_dir = Path(log_dir)
        self.cadence = cadence
        self._ckpt = ocp.CheckpointManager(
            (self.log_dir / "ckpt").resolve(),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=keep, save_interval_steps=cadence
            ),
        )
        self._latest = ocp.CheckpointManager(
            (self.log_dir / "latest_ckpt").resolve(),
            options=ocp.CheckpointManagerOptions(max_to_keep=1),
        )

    # ---- save ---------------------------------------------------------------

    def save_epoch(self, epoch: int, state) -> None:
        state = jax.device_get(state)
        self._ckpt.save(epoch, args=ocp.args.StandardSave(state))
        self._latest.save(epoch, args=ocp.args.StandardSave(state))
        self.save_weights(state)

    def save_weights(self, state) -> None:
        """Params-only artifact for the inference tools."""
        weights = {
            "params": jax.device_get(state.params),
            "batch_stats": jax.device_get(state.batch_stats),
        }
        path = (self.log_dir / WEIGHTS_NAME).resolve()
        checkpointer = ocp.StandardCheckpointer()
        checkpointer.save(path / "latest_epoch_weights", weights, force=True)
        checkpointer.wait_until_finished()

    def wait(self) -> None:
        self._ckpt.wait_until_finished()
        self._latest.wait_until_finished()

    # ---- restore --------------------------------------------------------------

    def latest_epoch(self) -> Optional[int]:
        return self._latest.latest_step()

    def restore_latest(self, abstract_state) -> Optional[Any]:
        step = self._latest.latest_step()
        if step is None:
            return None
        return self._latest.restore(
            step, args=ocp.args.StandardRestore(abstract_state)
        )

    def restore_epoch(self, epoch: int, abstract_state):
        return self._ckpt.restore(epoch, args=ocp.args.StandardRestore(abstract_state))

    def close(self) -> None:
        self._ckpt.close()
        self._latest.close()


def load_weights(checkpoint_dir, abstract_weights):
    """Load a ``weights/latest_epoch_weights`` artifact (inference tools path).

    ``checkpoint_dir`` may be the run dir or the weights dir itself.
    """
    base = Path(checkpoint_dir).resolve()
    candidates = [
        base / WEIGHTS_NAME / "latest_epoch_weights",
        base / "latest_epoch_weights",
        base,
    ]
    for path in candidates:
        if path.exists() and path.is_dir() and any(path.iterdir()):
            checkpointer = ocp.StandardCheckpointer()
            restored = checkpointer.restore(path, abstract_weights)
            _assert_nontrivial_match(restored)
            return restored
    raise FileNotFoundError(f"no weights checkpoint under {checkpoint_dir}")


def _assert_nontrivial_match(restored) -> None:
    """Restore sanity check (reference ``assert_nontrivial_match`` role)."""
    leaves = jax.tree.leaves(restored)
    if not leaves:
        raise ValueError("restored checkpoint is empty")
