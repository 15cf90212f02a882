"""Self-supervised MidasLite pretraining on the dataset's own SceneDepth EXRs.

The reference uses pretrained MiDaS v2 from TF Hub for its depth-aware loss term
(``/root/reference/realtime_style_transfer/models/styleLoss.py:250-287``).  That
binary cannot be bundled in a zero-egress image — but the Unreal HDR training
data carries ground-truth ``SceneDepth`` in every sample
(``hdrScreenshots.py:14-29``), so the depth net can be pretrained directly on
the corpus this framework trains on: FinalImage RGB -> normalized inverse
SceneDepth.  The resulting Orbax checkpoint feeds the depth loss via
``--depth_checkpoint`` (``train_network.py``), which is the supported way to
enable ``with_depth_loss``.

Functions here are import-friendly for tests; ``tools/pretrain_depth.py`` is the
CLI wrapper.  The data plane stays numpy/PIL-only (no accelerator dispatch).
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np

log = logging.getLogger(__name__)


def depth_to_target(scene_depth: np.ndarray, eps: float = 1e-6) -> np.ndarray:
    """Linear SceneDepth -> per-image normalized inverse depth in [0, 1].

    MiDaS-style nets predict *relative inverse* depth; normalizing per image
    makes the target scale-free (the loss term compares depth *differences*,
    ``styleLoss.py:277-285``, so absolute scale is irrelevant).
    """
    inv = 1.0 / (1.0 + np.maximum(scene_depth, 0.0))
    lo, hi = float(inv.min()), float(inv.max())
    return ((inv - lo) / max(hi - lo, eps)).astype(np.float32)


def load_depth_pairs(
    screenshot_paths: Sequence[Path], resolution: int
) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
    """Yield (rgb [res,res,3] in [0,1], target [res,res]) per screenshot.

    Each ``X.png`` must have a sibling ``X_SceneDepth.exr`` (the Unreal dump
    convention, reference ``hdrScreenshots.py:14-29``).  Unreadable samples are
    log-and-skipped (reference fault-tolerance convention, ``common.py:117-118``).
    """
    from .data.imaging import load_image, resize_bilinear
    from .data.native import read_exr

    for path in screenshot_paths:
        path = Path(path)
        depth_path = path.parent / f"{path.stem}_SceneDepth.exr"
        try:
            rgb = load_image(path, (resolution, resolution, 3))
            depth = read_exr(depth_path)["R"]
        except Exception as e:  # noqa: BLE001 — log-and-skip parity
            log.warning("skipping %s: %s", path, e)
            continue
        depth = resize_bilinear(depth[..., None], (resolution, resolution))[..., 0]
        yield rgb.astype(np.float32), depth_to_target(depth)


def correlation(a: np.ndarray, b: np.ndarray) -> float:
    """Pearson correlation between two arrays (the acceptance metric)."""
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    a -= a.mean()
    b -= b.mean()
    denom = np.sqrt((a * a).sum() * (b * b).sum())
    return float((a * b).sum() / denom) if denom > 0 else 0.0


def pretrain(
    training_paths: Sequence[Path],
    validation_paths: Sequence[Path],
    *,
    resolution: int = 384,
    base_filters: int = 32,
    epochs: int = 10,
    batch_size: int = 4,
    learning_rate: float = 1e-3,
    seed: int = 0,
    log_every: int = 10,
):
    """Train MidasLite on (FinalImage, SceneDepth) pairs.

    Returns ``(variables, history)`` where history has per-epoch train loss and
    validation correlation (predicted vs ground-truth inverse depth).
    """
    import jax
    import jax.numpy as jnp
    import optax

    from .models.depth import MidasLite

    model = MidasLite(base_filters=base_filters)
    rng = jax.random.PRNGKey(seed)
    dummy = jnp.zeros((1, resolution, resolution, 3), jnp.float32)
    variables = jax.jit(model.init)(rng, dummy)
    params = variables["params"]

    tx = optax.adam(learning_rate)
    opt_state = tx.init(params)

    def loss_fn(params, rgb, target):
        pred = model.apply({"params": params}, rgb)
        return jnp.mean(jnp.square(pred - target))

    @jax.jit
    def train_step(params, opt_state, rgb, target):
        loss, grads = jax.value_and_grad(loss_fn)(params, rgb, target)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    predict = jax.jit(lambda params, rgb: model.apply({"params": params}, rgb))

    # Materialize once: depth pretraining sets are small relative to EXR decode
    # cost, and epoch order reshuffles in memory.
    train_pairs = list(load_depth_pairs(training_paths, resolution))
    val_pairs = list(load_depth_pairs(validation_paths, resolution))
    if not train_pairs:
        raise ValueError("no readable (png, SceneDepth.exr) training pairs")

    def evaluate(params) -> float:
        if not val_pairs:
            return float("nan")
        cors = []
        for rgb, target in val_pairs:
            pred = np.asarray(predict(params, jnp.asarray(rgb[None])))[0]
            cors.append(correlation(pred, target))
        return float(np.mean(cors))

    history = {"train_loss": [], "val_correlation": [],
               "initial_val_correlation": evaluate(params)}
    shuffler = np.random.default_rng(seed)
    step = 0
    for epoch in range(epochs):
        order = shuffler.permutation(len(train_pairs))
        losses = []
        for start in range(0, len(order) - batch_size + 1, batch_size):
            idx = order[start:start + batch_size]
            rgb = jnp.asarray(np.stack([train_pairs[i][0] for i in idx]))
            target = jnp.asarray(np.stack([train_pairs[i][1] for i in idx]))
            params, opt_state, loss = train_step(params, opt_state, rgb, target)
            losses.append(float(loss))
            step += 1
            if log_every and step % log_every == 0:
                log.info("step %d: loss %.5f", step, losses[-1])
        val_cor = evaluate(params)
        history["train_loss"].append(float(np.mean(losses)) if losses else np.nan)
        history["val_correlation"].append(val_cor)
        log.info("epoch %d: train loss %.5f, val correlation %.4f",
                 epoch, history["train_loss"][-1], val_cor)

    return {"params": jax.device_get(params)}, history


def save_depth_checkpoint(variables, output: Path) -> None:
    import orbax.checkpoint as ocp

    checkpointer = ocp.StandardCheckpointer()
    checkpointer.save(Path(output).resolve(), variables, force=True)
    checkpointer.wait_until_finished()


def load_depth_checkpoint(path: Path):
    """Restore MidasLite variables saved by :func:`save_depth_checkpoint`."""
    import orbax.checkpoint as ocp

    restored = ocp.StandardCheckpointer().restore(Path(path).resolve())
    return restored if "params" in restored else {"params": restored}
