"""Default-tier smoke of the fused whole-net Pallas kernel.

The full equivalence sweeps live in ``test_fused_transfer.py`` (slow tier,
file-wide mark); this single test keeps the DEFAULT tier from shipping a
fused-kernel regression unnoticed: one interpret-mode run of the tiny
flagship-family plan through the fully-packed deploy contract
(``pack_frame_np`` -> ``stylize_prepacked_raw`` -> ``unpack_frame_np``)
against ``stylize_packed`` (itself exactness-tested against the flax module).
"""

import jax
import jax.numpy as jnp
import numpy as np

from realtime_style_transfer_tpu.models.inference import plan_from_config
from realtime_style_transfer_tpu.models.transfer import StyleTransferNet
from realtime_style_transfer_tpu.models.transfer_packed import stylize_packed
from realtime_style_transfer_tpu.ops.pallas.fused_transfer import FusedTransfer

from test_fused_transfer import TINY


def test_fused_prepacked_raw_matches_packed_smoke():
    rng = np.random.default_rng(21)
    plan = plan_from_config(TINY)
    net = StyleTransferNet(plan=plan, num_styles=1)
    content = jnp.asarray(
        rng.random((1,) + TINY.content_shape).astype(np.float32))
    style_params = jnp.asarray(
        (rng.random((1, 1, plan.num_style_parameters)) * 0.4 + 0.8)
        .astype(np.float32))
    variables = jax.jit(net.init, static_argnames=("train",))(
        jax.random.PRNGKey(3), content, style_params, train=False)

    want = np.asarray(jax.jit(
        lambda v, c, p: stylize_packed(v, c, p, plan=plan, dtype=jnp.bfloat16)
    )(variables, content, style_params), np.float32)

    fused = FusedTransfer(variables, plan, interpret=True)
    prepared = fused.prepare_style(style_params)
    packed_in = fused.pack_frame_np(np.asarray(content))
    raw = fused.stylize_prepacked_raw(jnp.asarray(packed_in), prepared)
    got = fused.unpack_frame_np(np.asarray(raw))

    assert got.shape == want.shape == (1,) + TINY.output_shape
    np.testing.assert_allclose(got, want, rtol=0.05, atol=0.02)
    assert np.median(np.abs(got - want)) < 5e-3
