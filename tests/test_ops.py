"""Numeric-oracle tests for the ops core (CIN, style blending, gram, TV, mips).

The style-weight blending oracle is a quadruple for-loop over pixels/styles, the
same validation strategy as the reference's only pure-math test
(``styleTransferTest.py:27-49``).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from realtime_style_transfer_tpu.ops import (
    StyleParamCursor,
    apply_style_weights,
    avg_pool_2x,
    concat_implicit_weight,
    conditional_instance_norm,
    gram_matrix,
    mean_l2_loss_on_batch,
    style_weight_mips,
    total_variation,
)


def test_apply_style_weights_matches_loop_oracle(rng):
    B, H, W, S, C = 2, 4, 6, 2, 3
    weights = rng.random((B, H, W, S)).astype(np.float32)
    params = rng.random((B, 1, S, C)).astype(np.float32)

    got = np.asarray(apply_style_weights(jnp.asarray(weights), jnp.asarray(params)))

    want = np.zeros((B, H, W, C), np.float32)
    for b in range(B):
        for y in range(H):
            for x in range(W):
                for s in range(S):
                    want[b, y, x, :] += weights[b, y, x, s] * params[b, 0, s, :]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_apply_style_weights_passthrough_single_style(rng):
    params = jnp.asarray(rng.random((2, 1, 1, 5)).astype(np.float32))
    out = apply_style_weights(jnp.ones((2, 4, 4, 1)), params)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(params))
    out = apply_style_weights(None, params)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(params))


def test_concat_implicit_weight(rng):
    w = rng.random((1, 3, 3, 1)).astype(np.float32)
    full = np.asarray(concat_implicit_weight(jnp.asarray(w)))
    np.testing.assert_allclose(full.sum(-1), np.ones((1, 3, 3)), rtol=1e-6)
    np.testing.assert_allclose(full[..., 1:], w, rtol=1e-6)


def test_cursor_slices_and_overflow(rng):
    params = jnp.asarray(rng.random((2, 1, 1, 10)).astype(np.float32))
    cur = StyleParamCursor(params)
    a = cur.take(4)
    b = cur.take(6)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(params[..., :4]))
    np.testing.assert_array_equal(np.asarray(b), np.asarray(params[..., 4:]))
    cur.assert_consumed()
    with pytest.raises(ValueError):
        cur.take(1)


def test_conditional_instance_norm_oracle(rng):
    B, H, W, C = 2, 5, 7, 3
    x = rng.standard_normal((B, H, W, C)).astype(np.float32) * 3 + 1
    scale = rng.random((B, 1, 1, C)).astype(np.float32)
    bias = rng.random((B, 1, 1, C)).astype(np.float32)
    eps = 1e-5

    got = np.asarray(
        conditional_instance_norm(
            jnp.asarray(x), jnp.asarray(scale), jnp.asarray(bias), epsilon=eps
        )
    )

    mean = x.mean(axis=(1, 2), keepdims=True)
    var = x.var(axis=(1, 2), keepdims=True)
    want = bias + (x - mean) / np.sqrt(var + eps) * scale
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_gram_matrix_oracle(rng):
    B, H, W, C = 2, 4, 5, 3
    f = rng.standard_normal((B, H, W, C)).astype(np.float32)
    got = np.asarray(gram_matrix(jnp.asarray(f)))
    want = np.einsum("bijc,bijd->bcd", f, f) / (H * W)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_total_variation_oracle(rng):
    imgs = rng.random((2, 6, 6, 3)).astype(np.float32)
    got = np.asarray(total_variation(jnp.asarray(imgs)))
    dh = np.abs(imgs[:, 1:] - imgs[:, :-1]).sum(axis=(1, 2, 3))
    dw = np.abs(imgs[:, :, 1:] - imgs[:, :, :-1]).sum(axis=(1, 2, 3))
    np.testing.assert_allclose(got, dh + dw, rtol=1e-5)


def test_mean_l2_loss_on_batch(rng):
    t = rng.standard_normal((3, 4, 5)).astype(np.float32)
    got = np.asarray(mean_l2_loss_on_batch(jnp.asarray(t)))
    np.testing.assert_allclose(got, (0.5 * t**2).mean(axis=(1, 2)), rtol=1e-5)


def test_style_weight_mips_keys_and_values(rng):
    w = rng.random((1, 16, 32, 2)).astype(np.float32)
    mips = style_weight_mips(jnp.asarray(w), num_mips=3)
    assert set(mips.keys()) == {32, 16, 8, 4}
    np.testing.assert_array_equal(np.asarray(mips[32]), w)
    # first mip is the 2x2 mean
    want = w.reshape(1, 8, 2, 16, 2, 2).mean(axis=(2, 4))
    np.testing.assert_allclose(np.asarray(mips[16]), want, rtol=1e-5)


def test_avg_pool_2x_shape():
    x = jnp.ones((1, 8, 8, 3))
    assert avg_pool_2x(x).shape == (1, 4, 4, 3)
