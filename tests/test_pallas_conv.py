"""Pallas tap-matmul conv vs lax (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from realtime_style_transfer_tpu.ops.pallas.conv_matmul import (
    conv_same_batched,
    conv_valid_matmul,
)


@pytest.mark.parametrize("shape,k", [
    ((12, 20, 8), 5),
    ((16, 16, 4), 3),
    ((8, 24, 17), 9),
])
def test_conv_valid_matmul_matches_lax(rng, shape, k):
    hp, wp, cin = shape[0] + k - 1, shape[1] + k - 1, shape[2]
    cout = 6
    x = jnp.asarray(rng.standard_normal((hp, wp, cin)).astype(np.float32))
    kernel = jnp.asarray(
        rng.standard_normal((k, k, cin, cout)).astype(np.float32) * 0.1
    )
    with pltpu.force_tpu_interpret_mode():
        got = conv_valid_matmul(x, kernel)
    want = jax.lax.conv_general_dilated(
        x[None], kernel, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )[0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_conv_same_batched_matches_lax(rng):
    x = jnp.asarray(rng.standard_normal((2, 12, 16, 5)).astype(np.float32))
    kernel = jnp.asarray(rng.standard_normal((3, 3, 5, 7)).astype(np.float32) * 0.1)
    with pltpu.force_tpu_interpret_mode():
        got = conv_same_batched(x, kernel)
    want = jax.lax.conv_general_dilated(
        x, kernel, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_conv_valid_matmul_fused_contract_epilogue(rng):
    x = jnp.asarray(rng.standard_normal((10, 12, 4)).astype(np.float32))
    kernel = jnp.asarray(rng.standard_normal((3, 3, 4, 6)).astype(np.float32) * 0.2)
    bias = jnp.asarray(rng.standard_normal(6).astype(np.float32))
    scale = jnp.asarray((rng.random(6) + 0.5).astype(np.float32))
    shift = jnp.asarray(rng.standard_normal(6).astype(np.float32))
    with pltpu.force_tpu_interpret_mode():
        got = conv_valid_matmul(x, kernel, bias=bias, scale=scale, shift=shift,
                                epilogue="contract")
    conv = jax.lax.conv_general_dilated(
        x[None], kernel, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))[0]
    want = jnp.maximum(jnp.maximum(conv + bias, 0.0) * scale + shift, 0.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)
