"""Training callbacks: image summaries, metrics, histograms, gradients, checkpoints.

Keeps the reference's callback taxonomy (SURVEY §5: ``SummaryImageCallback``,
``MetricsCallback``, ``HistogramCallback``, ``GradientsCallback``,
``CheckpointCallback``) on a minimal protocol the jitted trainer drives:

    on_train_begin(trainer) / on_epoch_end(epoch, state, logs) / on_train_end()

Differences from the reference, by design:

* image summaries land as PNGs under ``<log_dir>/images/`` AND as TensorBoard
  image events; the ``prediction_time`` scalar is measured end-start (the
  reference logged ``start - end``, a sign bug — ``tf_image_callback.py:31``)
* histogram/gradient summaries carry real bucket payloads (JSONL + TensorBoard
  histo events) plus mean/var scalars, produced by pure jitted reductions — no
  host-side layer traversal
* gradient stats are taken through the TRAINING graph (BatchNorm in batch-stats
  form), matching the reference's GradientTape over the fit graph
  (``gradients.py:18-36``)
"""

from __future__ import annotations

import logging
import time
from pathlib import Path
from typing import Any, Dict, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.imaging import tensor_to_image
from .checkpoint import CheckpointManager
from .metrics import MetricsWriter

log = logging.getLogger(__name__)


class Callback:
    def on_train_begin(self, trainer) -> None:  # noqa: D401
        pass

    def on_epoch_end(self, epoch: int, state, logs: Mapping[str, float]) -> None:
        pass

    def on_train_end(self) -> None:
        pass


class MetricsCallback(Callback):
    """Split train/val scalars into the JSONL stream (reference metrics.py:12-22)."""

    def __init__(self, writer: MetricsWriter):
        self.writer = writer

    def on_epoch_end(self, epoch, state, logs) -> None:
        self.writer.write_split_scalars(logs, epoch)


class CheckpointCallback(Callback):
    """Cadence + latest + weights saves per epoch (reference checkpoint.py:18-37)."""

    def __init__(self, manager: CheckpointManager):
        self.manager = manager

    def on_epoch_end(self, epoch, state, logs) -> None:
        self.manager.save_epoch(epoch, state)

    def on_train_end(self) -> None:
        self.manager.wait()


class SummaryImageCallback(Callback):
    """Write style/content once, and val+train predictions each epoch as PNGs.

    Reference ``tracing/tf_image_callback.py:13-34``.
    """

    def __init__(self, log_dir, training_model, validation_batch, training_batch):
        self.dir = Path(log_dir) / "images"
        self.dir.mkdir(parents=True, exist_ok=True)
        self.tm = training_model
        self.batches = {"validation": validation_batch, "training": training_batch}
        self.writer: Optional[MetricsWriter] = None
        self._wrote_inputs = False

    def on_train_begin(self, trainer) -> None:
        self.writer = getattr(trainer, "metrics_writer", None)

    def _write_inputs_once(self) -> None:
        if self._wrote_inputs:
            return
        for subset, (inputs, _gt) in self.batches.items():
            style = np.asarray(inputs["style"])[0, 0]
            content_rgb = np.asarray(inputs["content"])[0][..., :3]
            tensor_to_image(style).save(self.dir / f"{subset}_style.png")
            tensor_to_image(content_rgb).save(self.dir / f"{subset}_content.png")
        self._wrote_inputs = True

    def on_epoch_end(self, epoch, state, logs) -> None:
        self._write_inputs_once()
        for subset, (inputs, _gt) in self.batches.items():
            start = time.perf_counter()
            prediction = jax.device_get(self.tm.predict(state, inputs))
            elapsed = time.perf_counter() - start  # end - start: sign bug fixed
            image = tensor_to_image(prediction[0])
            path = self.dir / f"{subset}_prediction_{epoch:05d}.png"
            image.save(path)
            if self.writer is not None:
                self.writer.write_scalar(f"{subset}/prediction_time", elapsed, epoch)
                self.writer.write_image_png(
                    f"{subset}/prediction", path.read_bytes(),
                    image.height, image.width, epoch,
                )


NUM_HISTOGRAM_BINS = 30


def _tree_stats(tree, *, histogram: bool = False) -> Dict[str, Dict[str, Any]]:
    """Per-leaf summary stats (+ optional fixed-bin histograms), one jitted pass."""

    @jax.jit
    def stats(tree):
        def leaf(x):
            x = x.astype(jnp.float32)
            out = {
                "mean": jnp.mean(x),
                "var": jnp.var(x),
                "min": jnp.min(x),
                "max": jnp.max(x),
                "sum": jnp.sum(x),
                "sum_squares": jnp.sum(jnp.square(x)),
            }
            if histogram:
                lo, hi = out["min"], out["max"]
                # Degenerate (constant) leaves still get one populated bucket.
                hi = jnp.where(hi > lo, hi, lo + 1.0)
                edges = lo + (hi - lo) * jnp.linspace(0.0, 1.0,
                                                      NUM_HISTOGRAM_BINS + 1)
                out["bucket"], _ = jnp.histogram(x.reshape(-1), bins=edges)
                out["bucket_limit"] = edges[1:]
            return out

        return jax.tree.map(leaf, tree)

    flat = {}
    computed = jax.device_get(stats(tree))
    for path, leaf_stats in jax.tree_util.tree_flatten_with_path(
        computed, is_leaf=lambda x: isinstance(x, dict) and "mean" in x
    )[0]:
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        flat[name] = leaf_stats
    return flat


def _write_tree_summaries(writer: MetricsWriter, prefix: str, tree, epoch: int,
                          *, histogram: bool) -> None:
    for name, s in _tree_stats(tree, histogram=histogram).items():
        writer.write_scalar(f"{prefix}/{name}/mean", float(s["mean"]), epoch)
        writer.write_scalar(f"{prefix}/{name}/var", float(s["var"]), epoch)
        if histogram:
            writer.write_histogram(
                f"{prefix}/{name}",
                bucket_limits=np.asarray(s["bucket_limit"]).tolist(),
                buckets=np.asarray(s["bucket"]).astype(np.float64).tolist(),
                minimum=float(s["min"]), maximum=float(s["max"]),
                total=float(s["sum"]), sum_squares=float(s["sum_squares"]),
                step=epoch,
            )


class HistogramCallback(Callback):
    """Per-layer weight histograms each epoch (reference histogram.py:9-42)."""

    def __init__(self, writer: MetricsWriter, every: int = 1):
        self.writer = writer
        self.every = every

    def on_epoch_end(self, epoch, state, logs) -> None:
        if epoch % self.every:
            return
        _write_tree_summaries(self.writer, "weights", state.params, epoch,
                              histogram=True)


class GradientsCallback(Callback):
    """Gradient stats on a pinned datapoint (reference gradients.py:18-36).

    The gradient is taken through the TRAINING graph (``train=True``: BatchNorm
    in batch-stats form), matching the reference's GradientTape over the graph
    ``fit`` optimizes — not the inference graph.
    """

    def __init__(self, writer: MetricsWriter, training_model, pinned_batch,
                 every: int = 1):
        self.writer = writer
        self.tm = training_model
        self.batch = pinned_batch
        self.every = every
        self._grad_fn = None

    def on_epoch_end(self, epoch, state, logs) -> None:
        if epoch % self.every:
            return
        if self._grad_fn is None:
            def grads_of(params, batch_stats, batch):
                loss_fn = lambda p: self.tm.loss_and_metrics(
                    p, batch_stats, batch, train=True
                )[0]
                return jax.grad(loss_fn)(params)

            self._grad_fn = jax.jit(grads_of)
        grads = self._grad_fn(state.params, state.batch_stats, self.batch)
        _write_tree_summaries(self.writer, "gradients", grads, epoch,
                              histogram=True)
