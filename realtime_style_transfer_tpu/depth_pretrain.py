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


def generate_procedural_scene(
    seed: int, resolution: int = 384, num_objects: int = 12
) -> Tuple[np.ndarray, np.ndarray]:
    """CPU-rasterized random scene with ANALYTIC ground-truth depth.

    Zero-egress substitute for real (FinalImage, SceneDepth) screenshot
    pairs: random spheres and boxes over a receding ground plane, rasterized
    with a z-buffer, lambertian-ish shading and distance fog.  The fog and
    shading make depth *monocularly inferable from the RGB* — the cue a
    MiDaS-style net (reference ``styleLoss.py:250-255``) actually learns —
    while the returned depth is exact geometry, not a heuristic.

    Returns ``(rgb [res, res, 3] float32 in [0,1], depth [res, res] float32
    linear depth)`` — the same contract as a screenshot + SceneDepth pair.
    """
    rng = np.random.default_rng(seed)
    res = resolution
    yy, xx = np.mgrid[0:res, 0:res].astype(np.float32) / res  # [0,1)^2

    # Ground plane: depth grows toward the horizon (top of frame), like a
    # camera pitched down over terrain.
    horizon = 0.25 + 0.2 * rng.random()
    depth = (2.0 + 58.0 * np.clip(
        1.0 - (yy - horizon) / max(1.0 - horizon, 1e-3), 0.0, 1.0)
    ).astype(np.float32)
    albedo = np.empty((res, res, 3), np.float32)
    albedo[:] = rng.random(3) * 0.5 + 0.3
    # checker variation so the plane has texture
    checker = (np.floor(xx * 8) + np.floor((yy - horizon) * 8)) % 2
    albedo *= (0.75 + 0.25 * checker)[..., None]
    shade = np.full((res, res), 1.0, np.float32)

    light = rng.normal(size=3)
    light /= np.linalg.norm(light)
    light[2] = abs(light[2]) + 0.5  # toward the camera

    for _ in range(num_objects):
        kind = rng.choice(("sphere", "box"))
        cx, cy = rng.random(2)
        z = 2.0 + 50.0 * rng.random() ** 1.5          # object distance
        r = (0.03 + 0.15 * rng.random()) * 12.0 / (z + 6.0)  # size by depth
        color = rng.random(3) * 0.8 + 0.2
        if kind == "sphere":
            d2 = ((xx - cx) ** 2 + (yy - cy) ** 2) / max(r * r, 1e-8)
            inside = d2 < 1.0
            # sphere surface: closer at center, analytic normal shading
            h = np.sqrt(np.clip(1.0 - d2, 0.0, 1.0))
            obj_depth = z - r * 8.0 * h
            nx = (xx - cx) / max(r, 1e-8)
            ny = (yy - cy) / max(r, 1e-8)
            s = np.clip(nx * light[0] + ny * light[1] + h * light[2], 0.1, 1.0)
        else:
            w, hgt = r, r * (0.5 + rng.random())
            inside = (np.abs(xx - cx) < w) & (np.abs(yy - cy) < hgt)
            obj_depth = np.full_like(xx, z)
            s = np.full_like(xx, float(np.clip(light[2], 0.2, 1.0)))
        win = inside & (obj_depth < depth)
        depth[win] = obj_depth[win].astype(np.float32)
        albedo[win] = color
        shade[win] = s[win]

    rgb = albedo * shade[..., None]
    # distance fog: the dominant monocular depth cue (and physically what a
    # deferred renderer's aerial perspective does)
    fog = np.exp(-depth / 25.0)[..., None]
    sky = np.array([0.65, 0.72, 0.85], np.float32) * (0.8 + 0.2 * rng.random())
    rgb = rgb * fog + sky * (1.0 - fog)
    rgb += rng.normal(0, 0.005, rgb.shape)
    return (np.clip(rgb, 0.0, 1.0).astype(np.float32),
            depth.astype(np.float32))


def synthetic_depth_pairs(
    num_scenes: int, resolution: int, *, seed: int = 0
) -> List[Tuple[np.ndarray, np.ndarray]]:
    """``num_scenes`` procedural (rgb, normalized-inverse-depth) pairs."""
    pairs = []
    for i in range(num_scenes):
        rgb, depth = generate_procedural_scene(seed * 100003 + i, resolution)
        pairs.append((rgb, depth_to_target(depth)))
    return pairs


def correlation(a: np.ndarray, b: np.ndarray) -> float:
    """Pearson correlation between two arrays (the acceptance metric)."""
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    a -= a.mean()
    b -= b.mean()
    denom = np.sqrt((a * a).sum() * (b * b).sum())
    return float((a * b).sum() / denom) if denom > 0 else 0.0


def spearman_correlation(a: np.ndarray, b: np.ndarray) -> float:
    """Spearman rank correlation — the depth ORDERING metric (invariant to
    any monotone calibration of either map).

    A (near-)constant input scores 0: stable argsort of a flat array yields
    raster-order ranks, which would otherwise correlate spuriously with any
    smooth depth gradient (a constant predictor must not pass the gate).
    """
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    if a.std() < 1e-12 * (1.0 + np.abs(a.mean())):
        return 0.0
    if b.std() < 1e-12 * (1.0 + np.abs(b.mean())):
        return 0.0

    def ranks(x: np.ndarray) -> np.ndarray:
        order = np.argsort(x.ravel(), kind="stable")
        r = np.empty(order.size, np.float64)
        r[order] = np.arange(order.size, dtype=np.float64)
        return r

    return correlation(ranks(a), ranks(b))


def aligned_rmse(pred: np.ndarray, target: np.ndarray) -> float:
    """RMSE after least-squares scale/shift alignment of pred to target —
    the MiDaS evaluation protocol (affine-invariant disparity error; Ranftl
    et al. 2020 §4) applied to the normalized inverse-depth maps this stack
    trains on.  0 = perfect up to an affine map; 1-ish = uninformative."""
    p = np.asarray(pred, np.float64).ravel()
    t = np.asarray(target, np.float64).ravel()
    var = p.var()
    if var <= 0:
        return float(np.sqrt(np.mean((t - t.mean()) ** 2)))
    s = ((p - p.mean()) * (t - t.mean())).mean() / var
    b = t.mean() - s * p.mean()
    return float(np.sqrt(np.mean((s * p + b - t) ** 2)))


def evaluate_depth_checkpoint(variables, pairs) -> dict:
    """Score a MidasLite checkpoint against (rgb, target) pairs.

    Returns per-metric means over the pairs: ``spearman`` (rank agreement
    with the SceneDepth-derived target), ``pearson``, and ``aligned_rmse``
    (MiDaS-protocol affine-aligned error).  This is the quantitative bar the
    bundled checkpoint is gated on (tests/test_depth_pretrain.py) and what
    ``tools/pretrain_depth.py`` reports before saving.
    """
    import jax
    import jax.numpy as jnp

    from .models.depth import MidasLite

    model = MidasLite(base_filters=depth_base_filters(variables))
    apply = jax.jit(lambda imgs: model.apply(variables, imgs))
    sp, pe, rm = [], [], []
    for rgb, target in pairs:
        pred = np.asarray(apply(jnp.asarray(rgb[None])))[0]
        sp.append(spearman_correlation(pred, target))
        pe.append(correlation(pred, target))
        rm.append(aligned_rmse(pred, target))
    return {
        "spearman": float(np.mean(sp)),
        "pearson": float(np.mean(pe)),
        "aligned_rmse": float(np.mean(rm)),
        "n": len(sp),
    }


def pretrain(
    training_paths: Sequence[Path],
    validation_paths: Sequence[Path],
    *,
    resolution: int = 384,
    **kwargs,
):
    """Train MidasLite on on-disk (FinalImage, SceneDepth) screenshot pairs.

    Returns ``(variables, history)`` — see :func:`pretrain_on_pairs`.
    """
    # Materialize once: depth pretraining sets are small relative to EXR decode
    # cost, and epoch order reshuffles in memory.
    train_pairs = list(load_depth_pairs(training_paths, resolution))
    val_pairs = list(load_depth_pairs(validation_paths, resolution))
    return pretrain_on_pairs(train_pairs, val_pairs, resolution=resolution,
                             **kwargs)


def pretrain_on_pairs(
    train_pairs: Sequence[Tuple[np.ndarray, np.ndarray]],
    val_pairs: Sequence[Tuple[np.ndarray, np.ndarray]],
    *,
    resolution: int = 384,
    base_filters: int = 32,
    epochs: int = 10,
    batch_size: int = 4,
    learning_rate: float = 1e-3,
    seed: int = 0,
    log_every: int = 10,
):
    """Train MidasLite on in-memory (rgb, target) pairs.

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

    train_pairs = list(train_pairs)
    val_pairs = list(val_pairs)
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


# The committed synthetic-pretrained MidasLite weights (see
# tools/pretrain_depth.py --synthetic): the zero-egress stand-in for the
# reference's TF-Hub MiDaS v2 binary (``styleLoss.py:251-255``) that makes
# ``--depth_checkpoint`` usable out of the box.
BUNDLED_DEPTH_CHECKPOINT = (
    Path(__file__).parent / "assets" / "midas_lite_synthetic.npz")


def save_depth_checkpoint(variables, output: Path) -> None:
    """Save MidasLite variables: single-file ``.npz`` (committable) when the
    path ends in ``.npz``, else an Orbax checkpoint directory."""
    output = Path(output)
    if output.suffix == ".npz":
        from flax.traverse_util import flatten_dict

        flat = {"/".join(k): np.asarray(v)
                for k, v in flatten_dict(variables).items()}
        output.parent.mkdir(parents=True, exist_ok=True)
        with open(output, "wb") as f:
            np.savez(f, **flat)
        return
    import orbax.checkpoint as ocp

    checkpointer = ocp.StandardCheckpointer()
    checkpointer.save(output.resolve(), variables, force=True)
    checkpointer.wait_until_finished()


def load_depth_checkpoint(path: Path):
    """Restore MidasLite variables saved by :func:`save_depth_checkpoint`."""
    path = Path(path)
    if path.suffix == ".npz":
        from flax.traverse_util import unflatten_dict

        with np.load(path) as data:
            restored = unflatten_dict(
                {tuple(k.split("/")): data[k] for k in data.files})
    else:
        import orbax.checkpoint as ocp

        restored = ocp.StandardCheckpointer().restore(path.resolve())
    return restored if "params" in restored else {"params": restored}


def depth_base_filters(variables) -> int:
    """Infer MidasLite's ``base_filters`` from restored variables (the first
    encoder conv's output channel count)."""
    return int(np.asarray(
        variables["params"]["enc0_down"]["kernel"]).shape[-1])
