"""Loss-tower numeric tests: composition formula vs a numpy oracle, preprocessing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from realtime_style_transfer_tpu.models.losses import (
    DummyLossExtractor,
    LossFactors,
    make_style_loss_function,
    vgg_preprocess,
)


def test_vgg_preprocess_caffe_bgr():
    img = np.zeros((1, 2, 2, 3), np.float32)
    img[..., 0] = 1.0  # pure red in [0,1] RGB
    out = np.asarray(vgg_preprocess(jnp.asarray(img)))
    # BGR order: B channel = 0*255 - 103.939, G = -116.779, R = 255 - 123.68
    np.testing.assert_allclose(out[..., 0], -103.939, rtol=1e-5)
    np.testing.assert_allclose(out[..., 1], -116.779, rtol=1e-5)
    np.testing.assert_allclose(out[..., 2], 255.0 - 123.68, rtol=1e-5)


@pytest.fixture(scope="module")
def dummy_setup(rng=np.random.default_rng(0)):
    module = DummyLossExtractor()
    img = jnp.asarray(rng.random((2, 8, 8, 3)).astype(np.float32))
    variables = jax.jit(module.init)(jax.random.PRNGKey(0), img)
    apply = lambda x: module.apply(variables, x)
    return module, variables, apply


def test_loss_composition_matches_numpy_oracle(dummy_setup, rng):
    module, variables, apply = dummy_setup
    factors = LossFactors(content=2.0, style=3.0, total_variation=0.5)
    compute_loss = make_style_loss_function(apply, factors, None)

    pred = jnp.asarray(rng.random((2, 8, 8, 3)).astype(np.float32))
    gt_content = jnp.asarray(rng.random((2, 8, 8, 3)).astype(np.float32))
    gt_style = jnp.asarray(rng.random((2, 1, 8, 8, 3)).astype(np.float32))

    out = jax.jit(compute_loss)(pred, {"content": gt_content, "style": gt_style})

    # numpy oracle
    feats_pred = jax.device_get(apply(pred))
    feats_content = jax.device_get(apply(gt_content))
    feats_style = jax.device_get(apply(jnp.squeeze(gt_style, 1)))

    def l2(t):
        return (0.5 * t.astype(np.float64) ** 2).mean(axis=(1, 2, 3))

    def gram(f):
        b, h, w, c = f.shape
        g = np.einsum("bijc,bijd->bcd", f, f) / (h * w)
        return g

    feature = l2(
        feats_pred["content"]["dummy_conv2"] - feats_content["content"]["dummy_conv2"]
    ) * 2.0
    gdiff = gram(feats_pred["style"]["dummy_conv1"]) - gram(
        feats_style["style"]["dummy_conv1"]
    )
    style = (0.5 * gdiff**2).mean(axis=(1, 2)) * 3.0
    p = np.asarray(pred, np.float64)
    tv = (
        np.abs(p[:, 1:] - p[:, :-1]).sum(axis=(1, 2, 3))
        + np.abs(p[:, :, 1:] - p[:, :, :-1]).sum(axis=(1, 2, 3))
    ) * 0.5

    np.testing.assert_allclose(np.asarray(out["feature_loss"]), feature, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out["style_loss"]), style, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out["total_variation_loss"]), tv, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(out["loss"]), feature + style + tv, rtol=1e-4
    )


def test_multi_style_rejected(dummy_setup):
    _, _, apply = dummy_setup
    compute_loss = make_style_loss_function(apply, LossFactors(), None)
    pred = jnp.zeros((1, 8, 8, 3))
    with pytest.raises(ValueError, match="multiple styles"):
        compute_loss(pred, {
            "content": jnp.zeros((1, 8, 8, 3)),
            "style": jnp.zeros((1, 2, 8, 8, 3)),
        })


def test_depth_loss_term(rng):
    from realtime_style_transfer_tpu.models.depth import (
        make_depth_loss_fn, normalize_depth, ssitrim_loss,
    )

    depth_apply = lambda imgs: jnp.mean(imgs, axis=-1)  # fake depth net
    loss_fn = make_depth_loss_fn(depth_apply)
    gt = jnp.asarray(rng.random((2, 16, 16, 3)).astype(np.float32))
    out = loss_fn(gt, gt)
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)
    pred = jnp.asarray(rng.random((2, 16, 16, 3)).astype(np.float32))
    assert float(jnp.sum(loss_fn(gt, pred))) > 0

    d = jnp.asarray(rng.random((8, 8)).astype(np.float32))
    nd = np.asarray(normalize_depth(d))
    assert abs(np.median(nd)) < 1e-5  # median-centered
    assert float(ssitrim_loss(d, d)) == 0.0


def test_batch_tower_loss_is_bit_identical():
    """batch_tower=True (one batch-3B extractor pass) == the reference's three
    separate invocations (styleLoss.py:316-318), bit-for-bit — the tower is
    batch-independent.  (Which mode is FASTER is a hardware/shape question;
    measure with tools/bench_train_step.py --tower.)"""
    import functools

    rng = np.random.default_rng(0)
    ext = DummyLossExtractor()
    img = jnp.asarray(rng.random((2, 16, 16, 3)).astype(np.float32))
    variables = ext.init(jax.random.PRNGKey(0), img)
    apply_fn = functools.partial(ext.apply, variables)
    gt = {
        "content": jnp.asarray(rng.random((2, 16, 16, 3)).astype(np.float32)),
        "style": jnp.asarray(rng.random((2, 1, 16, 16, 3)).astype(np.float32)),
    }
    pred = jnp.asarray(rng.random((2, 16, 16, 3)).astype(np.float32))
    batched = jax.jit(
        make_style_loss_function(apply_fn, ext.factors, batch_tower=True)
    )(pred, gt)
    split = jax.jit(
        make_style_loss_function(apply_fn, ext.factors, batch_tower=False)
    )(pred, gt)
    for key in split:
        np.testing.assert_array_equal(
            np.asarray(batched[key]), np.asarray(split[key]))
    # tower_mode="scan" (lax.map over batch-1 passes) must also match, and its
    # gradient w.r.t. the prediction must equal the split tower's gradient
    scan_fn = make_style_loss_function(apply_fn, ext.factors,
                                       tower_mode="scan")
    scanned = jax.jit(scan_fn)(pred, gt)
    for key in split:
        np.testing.assert_allclose(
            np.asarray(scanned[key]), np.asarray(split[key]),
            rtol=1e-6, atol=1e-7)
    split_fn = make_style_loss_function(apply_fn, ext.factors)
    g_scan = jax.jit(jax.grad(lambda p: jnp.sum(scan_fn(p, gt)["loss"])))(pred)
    g_split = jax.jit(
        jax.grad(lambda p: jnp.sum(split_fn(p, gt)["loss"])))(pred)
    np.testing.assert_allclose(np.asarray(g_scan), np.asarray(g_split),
                               rtol=1e-5, atol=1e-6)
    # contradictory legacy/new knobs must raise, not silently pick one
    with pytest.raises(ValueError):
        make_style_loss_function(apply_fn, ext.factors,
                                 batch_tower=True, tower_mode="split")
