"""conv_transpose_2x must match lax.conv_transpose exactly (it replaces it)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from realtime_style_transfer_tpu.ops.conv import (
    conv_s2d,
    conv_same_s2d,
    conv_transpose_2x,
)


@pytest.mark.parametrize("k,stride,factor", [
    (3, 1, 2), (9, 1, 2), (9, 1, 4), (3, 2, 2), (9, 2, 2), (5, 2, 4),
])
def test_conv_s2d_matches_lax(rng, k, stride, factor):
    h, w, cin, cout = 16, 24, 4, 3
    x = jnp.asarray(rng.standard_normal((2, h, w, cin)).astype(np.float32))
    kernel = jnp.asarray(
        rng.standard_normal((k, k, cin, cout)).astype(np.float32)
    )
    want = jax.lax.conv_general_dilated(
        x, kernel, (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    got = conv_s2d(x, kernel, stride=stride, factor=factor)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("k", [3, 9])
@pytest.mark.parametrize("shape", [(1, 6, 10, 4), (2, 8, 12, 17)])
def test_conv_same_s2d_matches_lax(rng, k, shape):
    cout = 3
    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    kernel = jnp.asarray(
        rng.standard_normal((k, k, shape[-1], cout)).astype(np.float32)
    )
    want = jax.lax.conv_general_dilated(
        x, kernel, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    got = conv_same_s2d(x, kernel)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_conv_same_s2d_equals_conv_transpose_s1(rng):
    """convT stride 1 'SAME' (odd k, transpose_kernel=False) == plain conv."""
    x = jnp.asarray(rng.standard_normal((1, 6, 8, 4)).astype(np.float32))
    kernel = jnp.asarray(rng.standard_normal((9, 9, 4, 3)).astype(np.float32))
    want = jax.lax.conv_transpose(
        x, kernel, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    got = conv_same_s2d(x, kernel)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("k", [3, 5, 9])
@pytest.mark.parametrize("shape", [(1, 6, 10, 4), (2, 5, 7, 3)])
def test_matches_lax_conv_transpose(rng, k, shape):
    cout = 5
    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    kernel = jnp.asarray(
        rng.standard_normal((k, k, shape[-1], cout)).astype(np.float32)
    )
    want = jax.lax.conv_transpose(
        x, kernel, (2, 2), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    got = conv_transpose_2x(x, kernel)
    assert got.shape == want.shape == (shape[0], shape[1] * 2, shape[2] * 2, cout)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_gradients_flow(rng):
    x = jnp.asarray(rng.standard_normal((1, 4, 4, 2)).astype(np.float32))
    kernel = jnp.asarray(rng.standard_normal((3, 3, 2, 3)).astype(np.float32))

    def loss_fast(k):
        return jnp.sum(jnp.square(conv_transpose_2x(x, k)))

    def loss_lax(k):
        return jnp.sum(jnp.square(jax.lax.conv_transpose(
            x, k, (2, 2), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))))

    gf = jax.grad(loss_fast)(kernel)
    gl = jax.grad(loss_lax)(kernel)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gl), rtol=1e-4, atol=1e-4)
