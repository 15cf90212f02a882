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


def test_band_budget_knobs_move_band_heights(monkeypatch):
    """The RST_FUSED_BUDGET_MB knob family steers _pick_th (ROADMAP f12).

    The r3 band-budget sweep tuned the shipped defaults (14/12 MB budgets,
    18 MB scoped-VMEM cap) and proved taller bands lose; this locks (a) the
    shipped defaults, (b) that raising the budget never picks SHORTER bands
    and a huge budget actually picks taller ones, so future sweeps keep
    working through the env knobs without code edits.
    """
    import realtime_style_transfer_tpu.ops.pallas.fused_transfer as ft

    assert (ft._BUDGET_MB, ft._BUDGET_DUAL_MB, ft._VMEM_CAP_MB) == (14, 12, 18)

    rng = np.random.default_rng(5)
    plan = plan_from_config(TINY)
    net = StyleTransferNet(plan=plan, num_styles=1)
    content = jnp.asarray(
        rng.random((1,) + TINY.content_shape).astype(np.float32))
    style_params = jnp.asarray(
        rng.random((1, 1, plan.num_style_parameters)).astype(np.float32))
    variables = jax.jit(net.init, static_argnames=("train",))(
        jax.random.PRNGKey(3), content, style_params, train=False)
    fused = FusedTransfer(variables, plan, interpret=True)
    conv_stages = [(si, st) for si, st in enumerate(fused.stages)
                   if st.kind == "conv"]

    def heights():
        return [fused._pick_th(si, st) for si, st in conv_stages]

    base = heights()
    monkeypatch.setattr(ft, "_BUDGET_MB", 512)
    tall = heights()
    assert all(t >= b for t, b in zip(tall, base))
    # an unbounded budget picks the tallest legal band (hp // 2) everywhere
    assert all(t == fused.hp // 2 for t in tall)
    monkeypatch.setattr(ft, "_BUDGET_MB", 0.05)
    short = heights()
    assert all(s <= b for s, b in zip(short, base))
    assert min(short) == 1
