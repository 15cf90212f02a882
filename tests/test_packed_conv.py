"""Packed-domain conv exactness vs logical lax ops, for every seam the net uses."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # noqa: E402 — heavy tier (see pyproject markers)

from realtime_style_transfer_tpu.ops.packed_conv import (
    pack,
    packed_conv,
    packed_conv_transpose_2x,
    unpack,
)


def test_pack_unpack_roundtrip(rng):
    x = jnp.asarray(rng.standard_normal((2, 8, 12, 5)).astype(np.float32))
    np.testing.assert_array_equal(np.asarray(unpack(pack(x, 2), 2, 5)),
                                  np.asarray(x))
    np.testing.assert_array_equal(np.asarray(unpack(pack(x, 4), 4, 5)),
                                  np.asarray(x))


@pytest.mark.parametrize("k,s,fin,fout", [
    (9, 1, 2, 2),   # stem seam
    (3, 2, 2, 2),   # contract0 seam
    (3, 2, 2, 1),   # contract1 seam (unpacks into the res core)
    (9, 1, 4, 4),   # final layer (after an fout=4 transpose)
    (3, 1, 2, 2),   # generic s1
    (3, 1, 1, 2),   # packed-out only (equals conv_s2d)
])
def test_packed_conv_matches_logical(rng, k, s, fin, fout):
    h, w, cin, cout = 16, 24, 5, 7
    x = jnp.asarray(rng.standard_normal((2, h, w, cin)).astype(np.float32))
    kernel = jnp.asarray(rng.standard_normal((k, k, cin, cout)).astype(np.float32))

    want = jax.lax.conv_general_dilated(
        x, kernel, (s, s), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    got_packed = packed_conv(pack(x, fin), kernel, stride=s, fin=fin, fout=fout)
    got = unpack(got_packed, fout, cout)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("k,fin,fout", [
    (3, 1, 2),   # e0 seam: dense bottleneck in, packed out
    (3, 2, 4),   # e1 seam: packed in, deeper-packed out (fo=2 >= fin required)
])
def test_packed_conv_transpose_matches_lax(rng, k, fin, fout):
    h, w, cin, cout = 12, 16, 5, 3
    x = jnp.asarray(rng.standard_normal((1, h, w, cin)).astype(np.float32))
    kernel = jnp.asarray(rng.standard_normal((k, k, cin, cout)).astype(np.float32))

    want = jax.lax.conv_transpose(
        x, kernel, (2, 2), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    got_packed = packed_conv_transpose_2x(pack(x, fin), kernel, fin=fin, fout=fout)
    got = unpack(got_packed, fout, cout)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


import pytest


@pytest.mark.parametrize(
    "divider,bottleneck_y",
    [
        (16, 15),  # 2 contracts / 2 expands (the flagship family)
        (8, 15),   # 3 contracts / 3 expands (the rst-1920 divider-1 analog)
        (16, 30),  # 1 contract / 1 expand (shallow)
    ],
)
def test_packed_forward_matches_standard_transfer(rng, divider, bottleneck_y):
    """stylize_packed(variables, ...) == StyleTransferNet.apply on the SAME vars,
    across plan depths (the schedule is derived from the TransferPlan)."""
    import jax

    from realtime_style_transfer_tpu.config import ShapeConfig
    from realtime_style_transfer_tpu.models.transfer import StyleTransferNet
    from realtime_style_transfer_tpu.models.inference import plan_from_config
    from realtime_style_transfer_tpu.models.transfer_packed import stylize_packed

    cfg = ShapeConfig(resolution_divider=divider, bottleneck_res_y=bottleneck_y,
                      bottleneck_num_filters=4, num_channels=3, hdr=False)
    plan = plan_from_config(cfg)
    assert plan.num_contract_blocks == plan.num_expand_blocks
    net = StyleTransferNet(plan=plan, num_styles=1)
    content = jnp.asarray(rng.random((2,) + cfg.content_shape).astype(np.float32))
    style_params = jnp.asarray(
        (rng.random((2, 1, plan.num_style_parameters)) * 0.4 + 0.8)
        .astype(np.float32)
    )
    variables = jax.jit(net.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), content, style_params, train=False
    )
    want = np.asarray(net.apply(variables, content, style_params, train=False))
    got = np.asarray(jax.jit(
        lambda v, c, p: stylize_packed(v, c, p, plan=plan, dtype=jnp.float32)
    )(variables, content, style_params))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-4)


def test_packed_forward_matches_standard_dual_style(rng):
    """Packed dual-style blending (weight-map mips packed alongside activations)
    matches the standard path exactly (reference styleTransfer.py:288-345)."""
    import jax

    from realtime_style_transfer_tpu.config import ShapeConfig
    from realtime_style_transfer_tpu.models.transfer import StyleTransferNet
    from realtime_style_transfer_tpu.models.inference import plan_from_config
    from realtime_style_transfer_tpu.models.transfer_packed import stylize_packed

    cfg = ShapeConfig(resolution_divider=16, bottleneck_res_y=15,
                      bottleneck_num_filters=4, num_channels=3, hdr=False,
                      num_styles=2)
    plan = plan_from_config(cfg)
    net = StyleTransferNet(plan=plan, num_styles=2)
    content = jnp.asarray(rng.random((2,) + cfg.content_shape).astype(np.float32))
    style_params = jnp.asarray(
        (rng.random((2, 2, plan.num_style_parameters)) * 0.4 + 0.8)
        .astype(np.float32)
    )
    weights = jnp.asarray(
        rng.random((2,) + cfg.style_weights_shape).astype(np.float32)
    )
    variables = jax.jit(net.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), content, style_params, style_weights=weights,
        train=False,
    )
    want = np.asarray(
        net.apply(variables, content, style_params, style_weights=weights,
                  train=False)
    )
    got = np.asarray(jax.jit(
        lambda v, c, p, w: stylize_packed(v, c, p, w, plan=plan,
                                          dtype=jnp.float32)
    )(variables, content, style_params, weights))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-4)
