"""int8-quantized fused kernel: calibrate -> quantize -> parity (interpret).

Deploy-mode post-training quantization of the whole-net Pallas kernel
(``ops/pallas/fused_transfer.py`` ``quant='int8'``): per-input-channel
activation scales (captured by the kernel's own calibration mode) folded
into per-output-channel int8 weights, int32 accumulation, dequant in the
f32 epilogue.  No reference counterpart (the reference deploys f32 ONNX,
``save_using_checkpoint.py:90-103``); this is a TPU-serving knob (the v5e
MXU's int8 peak is 2x bf16).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # interpret-mode whole-net kernels

from realtime_style_transfer_tpu.config import ShapeConfig
from realtime_style_transfer_tpu.models.inference import plan_from_config
from realtime_style_transfer_tpu.models.transfer import StyleTransferNet
from realtime_style_transfer_tpu.ops.pallas.fused_transfer import (
    ACT_C,
    FusedTransfer,
)

def _build(num_styles: int):
    cfg = ShapeConfig(resolution_divider=15, bottleneck_res_y=16,
                      bottleneck_num_filters=8, num_channels=17, hdr=True,
                      num_styles=num_styles)
    plan = plan_from_config(cfg)
    net = StyleTransferNet(plan=plan, num_styles=num_styles)
    rng = np.random.default_rng(21 + num_styles)
    content = jnp.asarray(
        rng.random((1,) + cfg.content_shape).astype(np.float32))
    style_params = jnp.asarray(
        (rng.random((1, num_styles, plan.num_style_parameters)) * 0.4 + 0.8)
        .astype(np.float32))
    kwargs = {}
    if num_styles == 2:
        h, w, _ = cfg.content_shape
        yy = np.linspace(0, 1, h, dtype=np.float32)[None, :, None, None]
        kwargs["style_weights"] = jnp.asarray(
            np.broadcast_to(yy, (1, h, w, 1)).copy())
    variables = jax.jit(net.init, static_argnames=("train",))(
        jax.random.PRNGKey(3), content, style_params, train=False, **kwargs)
    return plan, jax.device_get(variables), content, style_params, kwargs


@pytest.fixture(scope="module")
def single():
    return _build(1)


def _quant_pair(plan, variables, style_params, content, style_weights=None):
    ft = FusedTransfer(variables, plan, interpret=True,
                       num_styles=2 if style_weights is not None else 1)
    prepared = ft.prepare_style(style_params, style_weights)
    packed = ft.pack_frame(content)
    ref = np.asarray(ft.stylize_prepacked(packed, prepared), np.float32)
    scales = ft.calibrate_act_scales([packed], prepared)
    ftq = FusedTransfer(variables, plan, interpret=True,
                        num_styles=2 if style_weights is not None else 1,
                        quant="int8", act_scales=scales)
    got = np.asarray(
        ftq.stylize_prepacked(packed, ftq.prepare_style(
            style_params, style_weights)), np.float32)
    return ref, got, scales


def test_quant_single_style_close_to_bf16(single):
    plan, variables, content, style_params, _ = single
    ref, got, scales = _quant_pair(plan, variables, style_params, content)
    assert scales.shape == (17, ACT_C)  # tiny stem kernel doesn't N-split
    # per-channel PTQ through all 17 stages: a few 1/254-granularity steps
    err = np.abs(got - ref)
    assert err.max() < 0.06
    assert np.median(err) < 0.01
    mse = float(np.mean((got - ref) ** 2))
    psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
    assert psnr > 35.0, psnr


def test_quant_dual_style_close_to_bf16():
    plan, variables, content, style_params, kw = _build(2)
    ref, got, _ = _quant_pair(plan, variables, style_params, content,
                              style_weights=kw["style_weights"])
    err = np.abs(got - ref)
    assert err.max() < 0.06
    assert np.median(err) < 0.01


def test_calibration_scales_cover_active_channels(single):
    plan, variables, content, style_params, _ = single
    ft = FusedTransfer(variables, plan, interpret=True)
    prepared = ft.prepare_style(style_params)
    packed = ft.pack_frame(content)
    scales = ft.calibrate_act_scales([packed], prepared)
    # stage 0 sees the packed content: 17ch * 16 subpixels active
    assert (scales[0, :17 * 16] > 0).all()
    assert (scales[0, 17 * 16:] == 0).all()  # zero-padded lanes stay zero
    # maxing over two identical frames changes nothing
    again = ft.calibrate_act_scales([packed, packed], prepared)
    np.testing.assert_array_equal(scales, again)


def test_maxed_scales_serve_multiple_styles(single):
    """The documented multi-style recipe (calibrate_act_scales docstring):
    calibrate per style, ``np.maximum`` the tables, serve BOTH styles from
    one quant engine — maxima compose conservatively, so fidelity holds even
    for the style whose activations the other table would have clipped."""
    plan, variables, content, style_params, _ = single
    ft = FusedTransfer(variables, plan, interpret=True)
    rng = np.random.default_rng(33)
    strong = jnp.asarray(
        (rng.random((1, 1, plan.num_style_parameters)) * 0.8 + 1.2)
        .astype(np.float32))  # larger CIN affines than `single`'s style
    styles = [style_params, strong]
    packed = ft.pack_frame(content)
    preps = [ft.prepare_style(s) for s in styles]
    tables = [ft.calibrate_act_scales([packed], p) for p in preps]
    assert (tables[1] >= tables[0]).mean() > 0.5  # B really is stronger
    maxed = np.maximum(tables[0], tables[1])
    ftq = FusedTransfer(variables, plan, interpret=True, quant="int8",
                        act_scales=maxed)
    for s, p in zip(styles, preps):
        ref = np.asarray(ft.stylize_prepacked(packed, p), np.float32)
        got = np.asarray(
            ftq.stylize_prepacked(packed, ftq.prepare_style(s)), np.float32)
        err = np.abs(got - ref)
        assert err.max() < 0.08, err.max()
        assert np.median(err) < 0.02, np.median(err)


def test_quant_requires_and_validates_scales(single):
    plan, variables, _, _, _ = single
    with pytest.raises(ValueError, match="act_scales"):
        FusedTransfer(variables, plan, interpret=True, quant="int8")
    with pytest.raises(ValueError, match="per-"):
        FusedTransfer(variables, plan, interpret=True, quant="int8",
                      act_scales=np.ones((3, ACT_C), np.float32))
    with pytest.raises(ValueError, match="quant"):
        FusedTransfer(variables, plan, interpret=True, quant="fp8")


def test_quant_chunk_mode_matches_single_frames(single):
    """Chunk mode (N frames per launch) on a quant engine is bit-identical
    to per-frame quant launches (the quant tables ride the same ref
    plumbing in the chunked kernel)."""
    plan, variables, content, style_params, _ = single
    ft = FusedTransfer(variables, plan, interpret=True)
    prepared = ft.prepare_style(style_params)
    packed1 = ft.pack_frame(content)
    scales = ft.calibrate_act_scales([packed1], prepared)
    ftq = FusedTransfer(variables, plan, interpret=True, quant="int8",
                        act_scales=scales)
    prepared_q = ftq.prepare_style(style_params)
    rng = np.random.default_rng(41)
    frames = rng.random((2,) + np.asarray(content).shape[1:]).astype(
        np.float32)
    packed = np.stack(
        [ftq.pack_frame_np(frames[i:i + 1]) for i in range(2)])
    chunk = np.asarray(
        ftq.stylize_prepacked_chunk(jnp.asarray(packed), prepared_q),
        np.float32)
    singles = np.concatenate([
        np.asarray(
            ftq.stylize_prepacked(jnp.asarray(packed[i]), prepared_q),
            np.float32)
        for i in range(2)])
    np.testing.assert_array_equal(chunk, singles)


def test_saturation_check_flags_mismatched_style_scales(single):
    """The deploy guard (check_act_saturation): scales calibrated for style
    A, deployed with a stronger style B, must report >1 max ratios and
    nonzero clip events; the matching style must report none."""
    plan, variables, content, style_params, _ = single
    ft = FusedTransfer(variables, plan, interpret=True)
    packed = ft.pack_frame(content)
    prep_a = ft.prepare_style(style_params)
    scales_a = ft.calibrate_act_scales([packed], prep_a)

    # matching (checkpoint, style): scales are the observed maxima, so no
    # quantize event exceeds them (ratio == 1 on the max element, no clips)
    ok = ft.check_act_saturation([packed], prep_a, scales_a)
    assert max(r["max_ratio"] for r in ok) <= 1.0 + 1e-5
    assert sum(r["clip_events"] for r in ok) == 0
    assert all(r["n_quantized"] > 0 for r in ok)

    # mismatched style with much larger CIN affines: saturates
    rng = np.random.default_rng(55)
    strong = jnp.asarray(
        (rng.random((1, 1, plan.num_style_parameters)) * 2.0 + 3.0)
        .astype(np.float32))
    prep_b = ft.prepare_style(strong)
    bad = ft.check_act_saturation([packed], prep_b, scales_a)
    assert max(r["max_ratio"] for r in bad) > 1.25
    assert sum(r["clip_events"] for r in bad) > 0

    # refuses to run on a quant engine (scales must come from bf16)
    ftq = FusedTransfer(variables, plan, interpret=True, quant="int8",
                        act_scales=scales_a)
    with pytest.raises(ValueError, match="bf16 engine"):
        ftq.check_act_saturation([packed], prep_a, scales_a)


def test_calibrate_refuses_on_quant_engine(single):
    plan, variables, content, style_params, _ = single
    ft = FusedTransfer(variables, plan, interpret=True)
    prepared = ft.prepare_style(style_params)
    packed = ft.pack_frame(content)
    scales = ft.calibrate_act_scales([packed], prepared)
    ftq = FusedTransfer(variables, plan, interpret=True,
                        quant="int8", act_scales=scales)
    with pytest.raises(ValueError, match="bf16 engine"):
        ftq.calibrate_act_scales([packed], prepared)


def test_quant_three_seg_close_to_bf16():
    """int8 PTQ on the divider-1 (3-contract) two-segment kernel: the
    calibrate tail and quantize chain work across both band grids and the
    fold2/unfold2 repack stages (repacks happen AFTER dequant, on bf16)."""
    cfg = ShapeConfig(resolution_divider=15, bottleneck_res_y=8,
                      bottleneck_num_filters=8, num_channels=17, hdr=True)
    plan = plan_from_config(cfg)
    assert plan.num_contract_blocks == 3
    net = StyleTransferNet(plan=plan, num_styles=1)
    rng = np.random.default_rng(24)
    content = jnp.asarray(
        rng.random((1,) + cfg.content_shape).astype(np.float32))
    style_params = jnp.asarray(
        (rng.random((1, 1, plan.num_style_parameters)) * 0.4 + 0.8)
        .astype(np.float32))
    variables = jax.device_get(jax.jit(net.init, static_argnames=("train",))(
        jax.random.PRNGKey(3), content, style_params, train=False))
    ref, got, scales = _quant_pair(plan, variables, style_params, content)
    assert scales.shape[1] == ACT_C
    err = np.abs(got - ref)
    assert err.max() < 0.06
    assert np.median(err) < 0.01


def test_quant_producer_edges_match_consumer_quantize(single):
    """Producer-quantized int8 edges (RST_FUSED_Q_EDGES): where a stage's
    only consumer is a transform-free conv, the producer quantizes its f32
    epilogue output with the consumer's act_inv row and ships int8.  The
    quantize point is the same — outputs may differ from the consumer-side
    engine only by +/-1-quantum ties from the skipped bf16 round-trip."""
    plan, variables, content, style_params, _ = single
    ft = FusedTransfer(variables, plan, interpret=True)
    prepared = ft.prepare_style(style_params)
    packed = ft.pack_frame(content)
    ref = np.asarray(ft.stylize_prepacked(packed, prepared), np.float32)
    scales = ft.calibrate_act_scales([packed], prepared)
    ft_off = FusedTransfer(variables, plan, interpret=True, quant="int8",
                           act_scales=scales, q_edges=False)
    ft_on = FusedTransfer(variables, plan, interpret=True, quant="int8",
                          act_scales=scales, q_edges=True)
    # the flagship edge set: stem->c1, c1->c2, c2->res0a (res0a is the only
    # transform-free res conv; everything downstream carries CIN affines)
    edges = [(st.name, st.q_out_si, st.q_in) for st in ft_on.stages
             if st.q_out_si >= 0 or st.q_in]
    assert edges == [("stem_n0", 2, False), ("stem_n1", 2, False),
                     ("c1", 3, True), ("c2", 4, True), ("res0a", -1, True)]
    assert all(st.q_out_si < 0 and not st.q_in for st in ft_off.stages)
    g_off = np.asarray(
        ft_off.stylize_prepacked(packed, ft_off.prepare_style(style_params)),
        np.float32)
    g_on = np.asarray(
        ft_on.stylize_prepacked(packed, ft_on.prepare_style(style_params)),
        np.float32)
    # both engines hold the standard PTQ fidelity bar vs bf16
    for got in (g_off, g_on):
        err = np.abs(got - ref)
        assert err.max() < 0.06 and np.median(err) < 0.01
    # and agree with each other up to quantization-tie noise
    d = np.abs(g_on - g_off)
    assert np.median(d) == 0.0
    assert d.max() < 0.03
