"""Training/inference model integration tests with dummy backends.

Mirrors the reference's strategy (``styleTransferTrainingModelTest.py``,
``styleTransferInferenceModelTest.py``): the DUMMY style extractor and the dummy
loss model stand in for MobileNet/VGG so tests run fast and offline, on a real
optimizer step over a tiny zeros dataset.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from realtime_style_transfer_tpu.config import ShapeConfig
from realtime_style_transfer_tpu.models.inference import make_inference_model, plan_from_config
from realtime_style_transfer_tpu.models.training import make_style_transfer_training_model

TINY = ShapeConfig(
    resolution_divider=16, bottleneck_res_y=15, bottleneck_num_filters=4,
    num_channels=3, hdr=False, feature_extractor="dummy", with_depth_loss=False,
)


def _batch(cfg, batch_size=2, seed=0):
    rng = np.random.default_rng(seed)
    inputs = {
        name: rng.random((batch_size,) + shape, dtype=np.float32)
        for name, shape in cfg.input_shape.items()
    }
    gt = {
        "content": inputs["content"][..., :3],
        "style": inputs["style"],
    }
    return inputs, gt


def test_inference_model_output_shape_and_range():
    model = make_inference_model(TINY)
    inputs, _ = _batch(TINY)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(inputs["content"]),
        jnp.asarray(inputs["style"]),
    )
    out = model.apply(variables, inputs["content"], inputs["style"])
    assert out.shape == (2, 60, 120, 3)
    o = np.asarray(out)
    assert np.isfinite(o).all() and (o >= 0).all() and (o <= 1).all()


def test_inference_model_two_styles():
    cfg = ShapeConfig(
        num_styles=2, resolution_divider=16, bottleneck_res_y=15,
        bottleneck_num_filters=4, num_channels=3, hdr=False,
        feature_extractor="dummy",
    )
    model = make_inference_model(cfg)
    inputs, _ = _batch(cfg)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(inputs["content"]),
        jnp.asarray(inputs["style"]), jnp.asarray(inputs["style_weights"]),
    )
    out = model.apply(
        variables, inputs["content"], inputs["style"], inputs["style_weights"]
    )
    assert out.shape == (2, 60, 120, 3)


def test_predict_style_params_shapes():
    model = make_inference_model(TINY)
    plan = plan_from_config(TINY)
    inputs, _ = _batch(TINY)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(inputs["content"]),
        jnp.asarray(inputs["style"]),
    )
    params = model.apply(
        variables, jnp.asarray(inputs["style"]), method=model.predict_style_params
    )
    assert params.shape == (2, 1, plan.num_style_parameters)
    # transfer-only path consumes the predicted params
    out = model.apply(
        variables, jnp.asarray(inputs["content"]), params, method=model.stylize
    )
    assert out.shape == (2, 60, 120, 3)


def test_train_step_runs_and_reduces_loss():
    tm = make_style_transfer_training_model(TINY, loss_extractor="dummy")
    state = tm.init_state(jax.random.PRNGKey(0))
    batch = _batch(TINY)
    batch = jax.tree.map(jnp.asarray, batch)

    train_step = tm.jitted_train_step(donate=False)
    state1, metrics1 = train_step(state, batch)
    for key in ("loss", "feature_loss", "style_loss", "total_variation_loss"):
        assert key in metrics1, key
        assert np.isfinite(float(metrics1[key]))
    assert int(state1.step) == 1

    # several steps on the same batch must reduce the loss (it's overfittable)
    state_n, metrics_n = state1, metrics1
    for _ in range(5):
        state_n, metrics_n = train_step(state_n, batch)
    assert float(metrics_n["loss"]) < float(metrics1["loss"])


def test_eval_step_metrics():
    tm = make_style_transfer_training_model(TINY, loss_extractor="dummy")
    state = tm.init_state(jax.random.PRNGKey(0))
    batch = jax.tree.map(jnp.asarray, _batch(TINY))
    metrics = tm.jitted_eval_step()(state, batch)
    assert set(metrics) >= {"loss", "feature_loss", "style_loss", "total_variation_loss"}


@pytest.mark.slow
def test_depth_loss_component_present():
    tm = make_style_transfer_training_model(
        TINY, loss_extractor="dummy", with_depth_loss=True
    )
    state = tm.init_state(jax.random.PRNGKey(0))
    batch = jax.tree.map(jnp.asarray, _batch(TINY))
    metrics = tm.jitted_eval_step()(state, batch)
    assert "depth_loss" in metrics
    assert np.isfinite(float(metrics["depth_loss"]))


@pytest.mark.slow
def test_remat_training_matches_standard():
    """jax.checkpoint remat must not change the math, only the memory profile."""
    tm_std = make_style_transfer_training_model(TINY, loss_extractor="dummy")
    tm_rmt = make_style_transfer_training_model(
        TINY, loss_extractor="dummy", remat=True
    )
    state_s = tm_std.init_state(jax.random.PRNGKey(0))
    state_r = tm_rmt.init_state(jax.random.PRNGKey(0))
    batch = jax.tree.map(jnp.asarray, _batch(TINY))
    _, m_s = tm_std.jitted_train_step(donate=False)(state_s, batch)
    _, m_r = tm_rmt.jitted_train_step(donate=False)(state_r, batch)
    for key in m_s:
        np.testing.assert_allclose(
            float(m_s[key]), float(m_r[key]), rtol=1e-5, atol=1e-6
        )
