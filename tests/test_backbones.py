"""Backbone architecture tests: tap presence, shapes, channel schedules."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from realtime_style_transfer_tpu.models.backbones import efficientnet as effnet
from realtime_style_transfer_tpu.models.backbones import mobilenetv3 as mnv3
from realtime_style_transfer_tpu.models.backbones import vgg


@pytest.fixture(scope="module")
def image():
    return jnp.asarray(
        np.random.default_rng(0).random((1, 64, 64, 3)).astype(np.float32)
    )


@pytest.mark.slow  # 40 s: full MobileNetV3 init+apply; correctness vs the TF
# reference is covered in the default tier by test_reference_parity's
# tap-by-tap fixture comparison
def test_mobilenetv3_taps_and_shapes(image):
    model = mnv3.MobileNetV3Small(capture=mnv3.STYLE_TAPS + mnv3.CONTENT_TAPS)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), image, train=False
    )
    features, taps = model.apply(variables, image, train=False)
    assert features.shape == (1, 2, 2, 576)  # 64 / 32 spatial, 576-ch head
    assert set(taps) == set(mnv3.STYLE_TAPS + mnv3.CONTENT_TAPS)
    # residual-add channel counts from the Keras MobileNetV3Small schedule
    assert taps["expanded_conv_2/Add"].shape[-1] == 24
    assert taps["expanded_conv_5/Add"].shape[-1] == 40
    assert taps["expanded_conv_7/Add"].shape[-1] == 48
    assert taps["expanded_conv_10/Add"].shape[-1] == 96


@pytest.mark.slow
def test_efficientnet_b3_taps(image):
    model = effnet.EfficientNetB3(
        capture=effnet.STYLE_TAPS_B3 + effnet.CONTENT_TAPS_B3
    )
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), image, train=False
    )
    features, taps = model.apply(variables, image, train=False)
    assert features.shape[-1] == effnet.round_filters(1280, effnet.B3_WIDTH)
    assert set(taps) == set(effnet.STYLE_TAPS_B3 + effnet.CONTENT_TAPS_B3)
    # B3 channel schedule (width 1.2): 24/32/48/96/136/232/384
    assert taps["block2c_add"].shape[-1] == 32
    assert taps["block4e_add"].shape[-1] == 96
    assert taps["block7b_add"].shape[-1] == 384


def test_efficientnet_b3_round_filters_schedule():
    widths = [effnet.round_filters(f, effnet.B3_WIDTH)
              for f in (32, 16, 24, 40, 80, 112, 192, 320, 1280)]
    assert widths == [40, 24, 32, 48, 96, 136, 232, 384, 1536]


@pytest.mark.slow
def test_efficientnet_v2s_forward(image):
    model = effnet.EfficientNetV2S()
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), image, train=False
    )
    features, _ = model.apply(variables, image, train=False)
    assert features.shape == (1, 2, 2, 1280)


def test_vgg16_taps(image):
    model = vgg.VGG16Features()
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), image)
    features, taps = model.apply(variables, image)
    assert set(taps) == set(vgg.STYLE_TAPS + vgg.CONTENT_TAPS)
    assert taps["block1_conv2"].shape == (1, 64, 64, 64)
    assert taps["block5_conv3"].shape == (1, 4, 4, 512)


@pytest.mark.slow
def test_predictor_efficientnet_backbone():
    from realtime_style_transfer_tpu.models.predictor import StylePredictor

    model = StylePredictor(num_top_parameters=10, feature_extractor="efficientnet")
    x = jnp.zeros((1, 64, 64, 3))
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), x, train=False
    )
    out = model.apply(variables, x, train=False)
    assert out.shape == (1, 10)


@pytest.mark.slow
def test_efficientnet_v2s_loss_extractor(image):
    """V2-S loss tower (framework extension): taps split into content/style
    groups with descending spatial resolution, usable by the loss builder."""
    import jax
    import jax.numpy as jnp

    from realtime_style_transfer_tpu.models.losses import (
        EfficientNetV2SLossExtractor,
        make_style_loss_function,
    )

    module = EfficientNetV2SLossExtractor()
    variables = jax.jit(module.init)(jax.random.PRNGKey(0), image)
    taps = module.apply(variables, image)
    assert set(taps) == {"content", "style"}
    assert len(taps["style"]) == 4 and len(taps["content"]) == 1
    widths = [t.shape[2] for t in taps["style"].values()]
    assert widths == sorted(widths, reverse=True)  # multi-scale

    loss_fn = make_style_loss_function(
        lambda imgs: module.apply(variables, imgs), module.factors
    )
    pred = jnp.clip(image + 0.1, 0, 1)
    losses = loss_fn(pred, {"content": image, "style": image})
    assert all(bool(jnp.isfinite(v).all()) for v in losses.values())
