"""Pallas CIN kernel vs the jnp oracle (interpret mode on CPU), incl. gradients."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from realtime_style_transfer_tpu.ops.normalization import conditional_instance_norm
from realtime_style_transfer_tpu.ops.pallas.cin import cin_pallas


def _run_interpreted(fn, *args):
    with pltpu.force_tpu_interpret_mode():
        return fn(*args)


@pytest.mark.parametrize("shape", [(2, 8, 16, 128), (1, 12, 10, 32), (2, 6, 4, 3)])
def test_cin_pallas_matches_oracle(rng, shape):
    b, h, w, c = shape
    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32) * 2 + 0.5)
    scale = jnp.asarray(rng.random((b, 1, 1, c)).astype(np.float32) + 0.5)
    bias = jnp.asarray(rng.standard_normal((b, 1, 1, c)).astype(np.float32))

    got = _run_interpreted(lambda *a: cin_pallas(*a, 1e-5), x, scale, bias)
    want = conditional_instance_norm(x, scale, bias, epsilon=1e-5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_cin_pallas_bf16(rng):
    b, h, w, c = 1, 8, 8, 128
    x = jnp.asarray(rng.standard_normal((b, h, w, c)).astype(np.float32))
    scale = jnp.ones((b, 1, 1, c), jnp.float32)
    bias = jnp.zeros((b, 1, 1, c), jnp.float32)
    got = _run_interpreted(
        lambda *a: cin_pallas(*a, 1e-5), x.astype(jnp.bfloat16), scale, bias
    )
    assert got.dtype == jnp.bfloat16
    want = conditional_instance_norm(x, scale, bias, epsilon=1e-5)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want), rtol=2e-2, atol=2e-2
    )


def test_cin_pallas_gradients_match(rng):
    shape = (1, 8, 8, 16)
    x = rng.standard_normal(shape).astype(np.float32)
    scale = rng.random((1, 1, 1, 16)).astype(np.float32) + 0.5
    bias = rng.standard_normal((1, 1, 1, 16)).astype(np.float32)

    def loss_pallas(x, s, b):
        return jnp.sum(jnp.square(cin_pallas(x, s, b, 1e-5)))

    def loss_ref(x, s, b):
        return jnp.sum(jnp.square(conditional_instance_norm(x, s, b, epsilon=1e-5)))

    with pltpu.force_tpu_interpret_mode():
        gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(
            jnp.asarray(x), jnp.asarray(scale), jnp.asarray(bias)
        )
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(
        jnp.asarray(x), jnp.asarray(scale), jnp.asarray(bias)
    )
    for got, want in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-3, atol=1e-3)
