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
    BUNDLED_DEPTH_CHECKPOINT,
    correlation,
    depth_base_filters,
    depth_to_target,
    generate_procedural_scene,
    load_depth_checkpoint,
    load_depth_pairs,
    pretrain,
    save_depth_checkpoint,
    synthetic_depth_pairs,
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


def test_bundled_depth_checkpoint_loads():
    """The committed synthetic-pretrained MidasLite weights (SURVEY row 9:
    the zero-egress stand-in for the reference's TF-Hub MiDaS binary,
    ``styleLoss.py:251-255``) ship with the package and load as variables."""
    assert BUNDLED_DEPTH_CHECKPOINT.exists(), BUNDLED_DEPTH_CHECKPOINT
    variables = load_depth_checkpoint(BUNDLED_DEPTH_CHECKPOINT)
    assert "params" in variables
    assert depth_base_filters(variables) == 16
    # npz round-trip preserves every leaf exactly
    import jax

    n_leaves = len(jax.tree_util.tree_leaves(variables))
    assert n_leaves > 20  # full encoder/decoder stack, not a stub


def test_npz_checkpoint_roundtrip(tmp_path):
    variables = {"params": {"enc0_down": {"kernel": np.ones((3, 3, 3, 4),
                                                            np.float32),
                                          "bias": np.zeros(4, np.float32)}}}
    path = tmp_path / "d.npz"
    save_depth_checkpoint(variables, path)
    restored = load_depth_checkpoint(path)
    assert depth_base_filters(restored) == 4
    np.testing.assert_array_equal(
        restored["params"]["enc0_down"]["kernel"],
        variables["params"]["enc0_down"]["kernel"])


def test_procedural_scene_contract():
    rgb, depth = generate_procedural_scene(5, 96)
    assert rgb.shape == (96, 96, 3) and depth.shape == (96, 96)
    assert rgb.dtype == np.float32 and depth.dtype == np.float32
    assert 0.0 <= rgb.min() and rgb.max() <= 1.0
    assert depth.min() > 0.0
    # deterministic per seed, distinct across seeds
    rgb2, depth2 = generate_procedural_scene(5, 96)
    np.testing.assert_array_equal(rgb, rgb2)
    rgb3, _ = generate_procedural_scene(6, 96)
    assert np.abs(rgb - rgb3).max() > 0.1
    # the fog cue: distance fog blends toward the bright sky color, so
    # brightness rises with DEPTH (i.e. with 1 - inverse-depth target) —
    # the monocular signal the net learns
    from realtime_style_transfer_tpu.depth_pretrain import correlation as corr

    # per-scene strength varies with albedo/layout draw, so average a dozen
    pairs = synthetic_depth_pairs(12, 96, seed=2)
    assert np.mean([corr(r[..., 2], 1.0 - t) for r, t in pairs]) > 0.3


@pytest.mark.slow
def test_depth_loss_ranks_depth_preservation_with_bundled_weights():
    """VERDICT r3 task 5 acceptance: through the REAL loss path
    (``make_depth_loss_fn``, reference ``styleLoss.py:277-285`` formula),
    the bundled weights must score a depth-preserving prediction (style-like
    global color shift) strictly better than a depth-destroying one
    (vertical flip) — i.e. the depth term is a meaningful training signal,
    not noise."""
    import jax
    import jax.numpy as jnp

    from realtime_style_transfer_tpu.models.depth import (
        MidasLite, make_depth_loss_fn,
    )

    variables = load_depth_checkpoint(BUNDLED_DEPTH_CHECKPOINT)
    model = MidasLite(base_filters=depth_base_filters(variables))
    apply = jax.jit(lambda imgs: model.apply(variables, imgs))

    rgb, depth = generate_procedural_scene(999, 384)
    # quality gate at the DEPLOY resolution (trained at 192, used at 384)
    pred = np.asarray(apply(jnp.asarray(rgb[None])))[0]
    assert correlation(pred, depth_to_target(depth)) > 0.6

    loss_fn = make_depth_loss_fn(apply)
    gt = jnp.asarray(rgb[None])
    good = jnp.asarray(np.clip(rgb * 0.85 + 0.08, 0.0, 1.0)[None])
    bad = jnp.asarray(rgb[::-1].copy()[None])
    loss_good = float(np.asarray(loss_fn(gt, good)).mean())
    loss_bad = float(np.asarray(loss_fn(gt, bad)).mean())
    assert loss_good * 5 < loss_bad, (loss_good, loss_bad)


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


@pytest.mark.slow
def test_bundled_checkpoint_quantitative_eval(tmp_path):
    """VERDICT r4 task 8: a numeric quality bar for the committed depth
    weights, measured against the SceneDepth ground-truth channel on HELD-OUT
    scenes (seeds disjoint from the committed pretraining sweep), at the
    deploy resolution, with rank (Spearman) and MiDaS-protocol
    affine-aligned RMSE metrics — not just a ranking check.

    Half the scenes are routed through the real dataset path (PNG +
    PIZ-compressed SceneDepth EXR siblings -> ``load_depth_pairs``), so the
    bar also covers the production ingest pipeline."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    from realtime_style_transfer_tpu.depth_pretrain import (
        evaluate_depth_checkpoint,
        generate_procedural_scene,
    )

    res = 384
    variables = load_depth_checkpoint(BUNDLED_DEPTH_CHECKPOINT)

    # in-memory held-out pairs (exact float targets)
    pairs = []
    for i in range(4):
        rgb, depth = generate_procedural_scene(10_000 + i, res)
        pairs.append((rgb, depth_to_target(depth)))
    scores = evaluate_depth_checkpoint(variables, pairs)
    # measured r5: spearman 0.89, pearson 0.87, aligned_rmse 0.105
    # (target std ~0.20, so ~75% of variance explained)
    assert scores["spearman"] > 0.75, scores
    assert scores["aligned_rmse"] < 0.15, scores

    # dataset-path pairs: PNG + PIZ SceneDepth EXR -> load_depth_pairs
    from realtime_style_transfer_tpu.data.exr import write_exr

    shot_dir = tmp_path / "shots"
    shot_dir.mkdir()
    paths = []
    for i in range(4):
        rgb, depth = generate_procedural_scene(11_000 + i, res)
        png = shot_dir / f"held{i}.png"
        PIL.Image.fromarray((rgb * 255).astype(np.uint8)).save(png)
        write_exr(shot_dir / f"held{i}_SceneDepth.exr",
                  {"R": depth.astype(np.float32)}, compression="piz")
        paths.append(png)
    disk_pairs = list(load_depth_pairs(paths, res))
    assert len(disk_pairs) == 4
    disk_scores = evaluate_depth_checkpoint(variables, disk_pairs)
    # slightly looser: PNG 8-bit quantization of the input
    assert disk_scores["spearman"] > 0.7, disk_scores
    assert disk_scores["aligned_rmse"] < 0.17, disk_scores
