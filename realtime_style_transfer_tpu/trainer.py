"""Epoch-loop trainer: jitted steps, device prefetch, callbacks, resume.

Role of the reference's ``train_network.py`` + Keras ``model.fit`` (reference
``train_network.py:128-138``): 300-epoch default regime, per-epoch validation,
callback fan-out, checkpoint resume via ``continue_from``.  TPU-first differences:
the step is one donated jitted function (optionally over a device mesh via
``parallel.DistributedTrainer``); the input pipeline overlaps host decode and
host->device transfer with compute through ``data.pipeline.DevicePrefetcher``.
"""

from __future__ import annotations

import logging
import time
from pathlib import Path
from typing import Callable, Dict, Iterable, List, Optional, Sequence

import jax
import numpy as np

from .data.pipeline import DevicePrefetcher
from .models.training import StyleTransferTrainingModel, TrainState
from .tracing.callbacks import Callback
from .tracing.checkpoint import CheckpointManager

log = logging.getLogger(__name__)


class Trainer:
    def __init__(
        self,
        training_model: StyleTransferTrainingModel,
        *,
        mesh=None,
        log_dir: Optional[Path] = None,
        callbacks: Sequence[Callback] = (),
        metrics_writer=None,
    ):
        self.tm = training_model
        self.mesh = mesh
        self.log_dir = Path(log_dir) if log_dir else None
        self.callbacks: List[Callback] = list(callbacks)
        self.metrics_writer = metrics_writer

        if mesh is not None:
            from .parallel.train import DistributedTrainer

            self._dist = DistributedTrainer(training_model, mesh)
            self._train_step = self._dist.train_step
            self._eval_step = self._dist.eval_step
            self._device_put = self._dist.shard_batch
        else:
            self._dist = None
            self._train_step = training_model.jitted_train_step()
            self._eval_step = training_model.jitted_eval_step()
            self._device_put = jax.device_put

    # ---- state ------------------------------------------------------------

    def init_state(self, rng=None) -> TrainState:
        if self._dist is not None:
            return self._dist.init_state(rng)
        return self.tm.init_state(rng)

    def resume(self, state: TrainState, checkpoints: CheckpointManager):
        """Restore the latest checkpoint if one exists; returns (state, epoch)."""
        abstract = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), jax.device_get(state)
        )
        restored = checkpoints.restore_latest(abstract)
        if restored is None:
            return state, 0
        epoch = checkpoints.latest_epoch()
        log.info("resuming from epoch %d", epoch)
        restored = jax.device_put(restored)
        return restored, epoch + 1

    # ---- loops ------------------------------------------------------------

    def _run_epoch(self, state, batches, *, train: bool, prefetch: int = 2):
        sums: Dict[str, float] = {}
        count = 0
        for batch in DevicePrefetcher(batches, depth=prefetch,
                                      device_put=self._device_put):
            if train:
                state, metrics = self._train_step(state, batch)
            else:
                metrics = self._eval_step(state, batch)
            metrics = jax.device_get(metrics)
            for name, value in metrics.items():
                sums[name] = sums.get(name, 0.0) + float(value)
            count += 1
        means = {name: value / max(count, 1) for name, value in sums.items()}
        return state, means, count

    def fit(
        self,
        state: TrainState,
        make_train_iter: Callable[[], Iterable],
        make_validation_iter: Optional[Callable[[], Iterable]] = None,
        *,
        epochs: int = 300,
        initial_epoch: int = 0,
        prefetch: int = 2,
    ) -> TrainState:
        for cb in self.callbacks:
            cb.on_train_begin(self)
        for epoch in range(initial_epoch, epochs):
            t0 = time.perf_counter()
            state, train_metrics, steps = self._run_epoch(
                state, make_train_iter(), train=True, prefetch=prefetch
            )
            logs = dict(train_metrics)
            if make_validation_iter is not None:
                _, val_metrics, _ = self._run_epoch(
                    state, make_validation_iter(), train=False, prefetch=prefetch
                )
                logs.update({f"val_{k}": v for k, v in val_metrics.items()})
            logs["epoch_time"] = time.perf_counter() - t0
            logs["steps"] = steps
            log.info(
                "epoch %d: %s",
                epoch,
                " ".join(f"{k}={v:.5g}" for k, v in sorted(logs.items())),
            )
            for cb in self.callbacks:
                cb.on_epoch_end(epoch, state, logs)
        for cb in self.callbacks:
            cb.on_train_end()
        return state
