"""Depth pretraining on SceneDepth fixtures: learnable signal, improving corr.

VERDICT/ROADMAP item "make the depth loss real or off": the depth net trains on
the dataset's own ground-truth SceneDepth channel (reference
``hdrScreenshots.py:14-29`` file convention, ``styleLoss.py:250-287`` loss role).
These tests fabricate screenshots whose depth IS a function of the RGB (so the
mapping is learnable), pretrain a tiny MidasLite for a few epochs, and require a
positive, improving validation correlation — the acceptance criterion for
shipping depth-loss weights.
"""

import numpy as np
import PIL.Image
import pytest

from realtime_style_transfer_tpu.depth_pretrain import (
    correlation,
    depth_to_target,
    load_depth_checkpoint,
    load_depth_pairs,
    pretrain,
    save_depth_checkpoint,
)

RES = 48  # MidasLite needs multiples of 16


def _write_scene(directory, stem, seed):
    """Screenshot where brightness encodes depth (learnable monotone mapping)."""
    from realtime_style_transfer_tpu.data.exr import write_exr

    directory.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:RES, 0:RES].astype(np.float32) / RES
    cx, cy = rng.random(2)
    depth = 1.0 + 8.0 * ((xx - cx) ** 2 + (yy - cy) ** 2)  # radial depth field
    brightness = 1.0 / depth  # RGB directly encodes inverse depth
    rgb = np.stack([brightness] * 3, axis=-1)
    rgb += rng.normal(0, 0.01, rgb.shape).astype(np.float32)
    rgb = np.clip(rgb, 0.0, 1.0)
    PIL.Image.fromarray((rgb * 255).astype(np.uint8)).save(
        directory / f"{stem}.png"
    )
    write_exr(directory / f"{stem}_SceneDepth.exr",
              {"R": depth.astype(np.float32)})


@pytest.fixture(scope="module")
def depth_fixture(tmp_path_factory):
    root = tmp_path_factory.mktemp("depth")
    train_paths, val_paths = [], []
    for i in range(6):
        _write_scene(root / "training", f"shot{i}", seed=i)
        train_paths.append(root / "training" / f"shot{i}.png")
    for i in range(2):
        _write_scene(root / "validation", f"val{i}", seed=100 + i)
        val_paths.append(root / "validation" / f"val{i}.png")
    return train_paths, val_paths


def test_depth_to_target_is_monotone_decreasing_in_depth():
    depth = np.array([[1.0, 2.0], [4.0, 8.0]], np.float32)
    t = depth_to_target(depth)
    assert t[0, 0] == 1.0 and t[1, 1] == 0.0
    flat_d, flat_t = depth.ravel(), t.ravel()
    order = np.argsort(flat_d)
    assert (np.diff(flat_t[order]) <= 0).all()


def test_load_depth_pairs_skips_missing_exr(tmp_path, depth_fixture, caplog):
    train_paths, _ = depth_fixture
    orphan = tmp_path / "orphan.png"
    PIL.Image.fromarray(np.zeros((RES, RES, 3), np.uint8)).save(orphan)
    pairs = list(load_depth_pairs([orphan, train_paths[0]], RES))
    assert len(pairs) == 1  # orphan (no SceneDepth sibling) log-and-skipped
    rgb, target = pairs[0]
    assert rgb.shape == (RES, RES, 3) and target.shape == (RES, RES)
    assert 0.0 <= target.min() and target.max() <= 1.0


@pytest.mark.slow
def test_pretrain_improves_validation_correlation(depth_fixture, tmp_path):
    train_paths, val_paths = depth_fixture
    variables, history = pretrain(
        train_paths, val_paths,
        resolution=RES, base_filters=4, epochs=8, batch_size=3,
        learning_rate=3e-3, seed=0, log_every=0,
    )
    final = history["val_correlation"][-1]
    # random init has no relationship to depth; trained must correlate strongly
    assert final > 0.5, history
    assert final > history["initial_val_correlation"] + 0.2, history

    # checkpoint round trip feeds the training model's depth loss
    save_depth_checkpoint(variables, tmp_path / "ckpt")
    restored = load_depth_checkpoint(tmp_path / "ckpt")

    import jax
    import jax.numpy as jnp

    from realtime_style_transfer_tpu.models.depth import MidasLite

    model = MidasLite(base_filters=4)
    rgb, target = next(load_depth_pairs(val_paths, RES))
    pred = np.asarray(
        jax.jit(model.apply)(restored, jnp.asarray(rgb[None]))
    )[0]
    assert correlation(pred, target) > 0.5
