"""Transfer-net architecture tests: block math, style-param ABI, forward shapes."""

import jax
import jax.numpy as jnp
import numpy as np

from realtime_style_transfer_tpu.config import ShapeConfig
from realtime_style_transfer_tpu.models.inference import plan_from_config
from realtime_style_transfer_tpu.models.transfer import (
    StyleTransferNet,
    make_transfer_plan,
    style_param_count,
)

# Tiny test config: 60x120 frames, bottleneck 15 rows -> 2 contract / 2 expand blocks
TINY = ShapeConfig(
    resolution_divider=16, bottleneck_res_y=15, bottleneck_num_filters=4,
    num_channels=3, hdr=False,
)


def test_block_count_math_default_config():
    # reference styleTransfer.py:217,258 for the default 480x960 / 120-row bottleneck
    plan = plan_from_config(ShapeConfig())
    assert plan.num_contract_blocks == 2
    assert plan.num_expand_blocks == 2
    assert len(plan.expand_blocks) == 3  # + final 9x9 sigmoid block
    assert plan.expand_blocks[-1] == (3, 9, 1)


def test_style_param_count_is_2662_for_flagship():
    # 5 res blocks x (2 convs x 128 feats x 2 params) + expands 2*32+2*16+2*3
    # = 2560 + 102 = 2662 (SURVEY §3.2; reference styleTransfer.py:278-279)
    n = style_param_count((480, 960, 17), (480, 960, 3), 120, 128)
    assert n == 2662


def test_style_param_count_tiny():
    plan = plan_from_config(TINY)
    # res: 5 * 2*2*4 = 80; expands use the FIXED schedule (32, 16, final 3):
    # 2*32 + 2*16 + 2*3 = 102 (reference styleTransfer.py:247-256)
    assert plan.num_style_parameters == 80 + 2 * 32 + 2 * 16 + 2 * 3


def _forward(cfg, num_styles=1, train=False):
    plan = plan_from_config(cfg)
    net = StyleTransferNet(plan=plan, num_styles=num_styles)
    rng = jax.random.PRNGKey(0)
    content = jnp.ones((2,) + cfg.content_shape) * 0.5
    style_params = (
        jax.random.normal(rng, (2, num_styles, plan.num_style_parameters)) * 0.1
    )
    weights = None
    if num_styles > 1:
        weights = jnp.ones((2,) + cfg.style_weights_shape) * 0.3
    variables = net.init(rng, content, style_params, weights, train=False)
    out = net.apply(variables, content, style_params, weights, train=False)
    return out


def test_forward_shape_single_style():
    out = _forward(TINY)
    assert out.shape == (2, 60, 120, 3)
    assert out.dtype == jnp.float32
    o = np.asarray(out)
    assert np.isfinite(o).all()
    assert (o >= 0).all() and (o <= 1).all()  # sigmoid output


def test_forward_shape_dual_style():
    cfg = ShapeConfig(
        num_styles=2, resolution_divider=16, bottleneck_res_y=15,
        bottleneck_num_filters=4, num_channels=3, hdr=False,
    )
    out = _forward(cfg, num_styles=2)
    assert out.shape == (2, 60, 120, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_dual_style_weight_map_blends_styles():
    """weight=0 -> pure style A; weight=1 -> pure style B; differ from each other."""
    cfg = ShapeConfig(
        num_styles=2, resolution_divider=16, bottleneck_res_y=15,
        bottleneck_num_filters=4, num_channels=3, hdr=False,
    )
    plan = plan_from_config(cfg)
    net = StyleTransferNet(plan=plan, num_styles=2)
    rng = jax.random.PRNGKey(1)
    content = jax.random.uniform(rng, (1,) + cfg.content_shape)
    p = jax.random.normal(rng, (1, 2, plan.num_style_parameters))
    variables = net.init(rng, content, p, jnp.zeros((1,) + cfg.style_weights_shape))

    out_a = net.apply(variables, content, p, jnp.zeros((1,) + cfg.style_weights_shape))
    out_b = net.apply(variables, content, p, jnp.ones((1,) + cfg.style_weights_shape))

    # swapping the styles with the flipped weight map must agree
    p_swapped = p[:, ::-1, :]
    out_b_swapped = net.apply(
        variables, content, p_swapped, jnp.zeros((1,) + cfg.style_weights_shape)
    )
    np.testing.assert_allclose(
        np.asarray(out_b), np.asarray(out_b_swapped), rtol=1e-4, atol=1e-5
    )
    assert not np.allclose(np.asarray(out_a), np.asarray(out_b), atol=1e-3)


def test_hdr_17_channel_input():
    cfg = ShapeConfig(
        resolution_divider=16, bottleneck_res_y=15, bottleneck_num_filters=4,
        num_channels=17, hdr=True,
    )
    assert cfg.content_shape == (60, 120, 17)
    out = _forward(cfg)
    assert out.shape == (2, 60, 120, 3)


def test_style_params_shape_mismatch_raises():
    plan = plan_from_config(TINY)
    net = StyleTransferNet(plan=plan, num_styles=1)
    content = jnp.ones((1,) + TINY.content_shape)
    bad = jnp.ones((1, 1, plan.num_style_parameters + 1))
    try:
        net.init(jax.random.PRNGKey(0), content, bad)
        raised = False
    except ValueError:
        raised = True
    assert raised
