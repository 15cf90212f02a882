"""Fused whole-net Pallas kernel == packed/standard paths (interpret mode).

The fused kernel (``ops/pallas/fused_transfer.py``) runs the entire flagship
pipeline in one pallas_call; these tests assert bf16-tolerance equivalence with
``stylize_packed`` (itself exactness-tested against ``StyleTransferNet.apply``)
on a flagship-shaped tiny config, plus numpy-vs-jnp equality of the host-side
packed-kernel assembly twins.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # noqa: E402 — heavy tier (see pyproject markers)

from realtime_style_transfer_tpu.config import ShapeConfig
from realtime_style_transfer_tpu.models.inference import plan_from_config
from realtime_style_transfer_tpu.models.transfer import StyleTransferNet
from realtime_style_transfer_tpu.models.transfer_packed import stylize_packed
from realtime_style_transfer_tpu.ops.packed_conv import (
    packed_conv_kernel,
    packed_conv_transpose_kernel,
)
from realtime_style_transfer_tpu.ops.pallas.fused_transfer import (
    FusedTransfer,
    _np_packed_kernel,
    _np_transpose_kernel,
)

# (64, 128) frames, 17 channels, (16, 32) bottleneck: flagship-family shapes
# with packed width 32 (a multiple of 8) and 2 row bands.
TINY = ShapeConfig(resolution_divider=15, bottleneck_res_y=16,
                   bottleneck_num_filters=8, num_channels=17, hdr=True)


@pytest.mark.parametrize(
    "k,s,fin,fout",
    [(9, 1, 4, 4), (3, 2, 4, 2), (3, 2, 2, 1), (3, 1, 1, 1)],
)
def test_np_packed_kernel_matches_jnp(rng, k, s, fin, fout):
    kernel = rng.standard_normal((k, k, 5, 3)).astype(np.float32)
    pk_np, pads_y, pads_x, s_np = _np_packed_kernel(
        kernel, stride=s, fin=fin, fout=fout)
    pk_j, pads_y_j, pads_x_j, s_j = packed_conv_kernel(
        jnp.asarray(kernel), stride=s, fin=fin, fout=fout)
    assert (pads_y, pads_x, s_np) == (pads_y_j, pads_x_j, s_j)
    np.testing.assert_array_equal(pk_np, np.asarray(pk_j))
    assert s_np == 1 or (s, fin, fout) == (3, 1, 1, 1)


@pytest.mark.parametrize("fin,fout", [(1, 2), (2, 4)])
def test_np_transpose_kernel_matches_jnp(rng, fin, fout):
    kernel = rng.standard_normal((3, 3, 4, 6)).astype(np.float32)
    pk_np, pads_y, pads_x, s_np = _np_transpose_kernel(
        kernel, fin=fin, fout=fout)
    pk_j, pads_y_j, pads_x_j, s_j = packed_conv_transpose_kernel(
        jnp.asarray(kernel), fin=fin, fout=fout)
    assert (pads_y, pads_x, s_np) == (pads_y_j, pads_x_j, s_j)
    np.testing.assert_array_equal(pk_np, np.asarray(pk_j))
    assert s_np == 1


@pytest.fixture(scope="module")
def flagship_tiny(rng=None):
    rng = np.random.default_rng(21)
    cfg = TINY
    plan = plan_from_config(cfg)
    net = StyleTransferNet(plan=plan, num_styles=1)
    content = jnp.asarray(
        rng.random((1,) + cfg.content_shape).astype(np.float32))
    style_params = jnp.asarray(
        (rng.random((1, 1, plan.num_style_parameters)) * 0.4 + 0.8)
        .astype(np.float32))
    variables = jax.jit(net.init, static_argnames=("train",))(
        jax.random.PRNGKey(3), content, style_params, train=False)
    return cfg, plan, net, variables, content, style_params


def test_fused_matches_packed(flagship_tiny):
    cfg, plan, _net, variables, content, style_params = flagship_tiny
    want = np.asarray(jax.jit(
        lambda v, c, p: stylize_packed(v, c, p, plan=plan, dtype=jnp.bfloat16)
    )(variables, content, style_params), np.float32)

    fused = FusedTransfer(variables, plan, interpret=True)
    got = np.asarray(fused(content, style_params), np.float32)
    assert got.shape == want.shape == (1,) + cfg.output_shape
    # both paths are bf16 with different summation orders for the moments
    np.testing.assert_allclose(got, want, rtol=0.05, atol=0.02)
    # tight agreement for the bulk of pixels
    assert np.median(np.abs(got - want)) < 5e-3


def test_direct_ring_bit_identical_to_staging(flagship_tiny):
    """The r4 direct band-DMA-to-compute-ring path (no-transform stages DMA
    straight into the padded compute ring, finding-9 re-land) must be
    BIT-identical to the staging-pass structure: same values, same summation
    order — only the copy is gone."""
    _cfg, plan, _net, variables, content, style_params = flagship_tiny
    base = FusedTransfer(variables, plan, interpret=True, direct_ring=False)
    direct = FusedTransfer(variables, plan, interpret=True, direct_ring=True)
    prep_b = base.prepare_style(style_params)
    prep_d = direct.prepare_style(style_params)
    packed = base.pack_frame(content)
    want = np.asarray(base.stylize_prepacked(packed, prep_b), np.float32)
    got = np.asarray(direct.stylize_prepacked(packed, prep_d), np.float32)
    np.testing.assert_array_equal(got, want)


def test_k_resident_bit_identical_to_streamed(flagship_tiny):
    """The r5 VMEM-resident stage-kernel layout (every packed conv kernel
    arrives as a VMEM blockspec input instead of a per-stage HBM->VMEM copy)
    must be BIT-identical to the streamed layout: same matmuls, same
    summation order — only the per-stage kernel DMA is gone."""
    _cfg, plan, _net, variables, content, style_params = flagship_tiny
    base = FusedTransfer(variables, plan, interpret=True, k_resident=False)
    res = FusedTransfer(variables, plan, interpret=True, k_resident=True)
    prep_b = base.prepare_style(style_params)
    prep_r = res.prepare_style(style_params)
    packed = base.pack_frame(content)
    want = np.asarray(base.stylize_prepacked(packed, prep_b), np.float32)
    got = np.asarray(res.stylize_prepacked(packed, prep_r), np.float32)
    np.testing.assert_array_equal(got, want)


def test_fused_matches_standard_f32_loosely(flagship_tiny):
    cfg, plan, net, variables, content, style_params = flagship_tiny
    want = np.asarray(
        net.apply(variables, content, style_params, train=False), np.float32)
    fused = FusedTransfer(variables, plan, interpret=True)
    got = np.asarray(fused(content, style_params), np.float32)
    np.testing.assert_allclose(got, want, rtol=0.08, atol=0.03)


def test_fused_rejects_unsupported_plans(flagship_tiny):
    _cfg, _plan, _net, variables, _c, _p = flagship_tiny
    # 1-contract/1-expand (shallow family): outside both supported schedules
    bad = ShapeConfig(resolution_divider=16, bottleneck_res_y=30,
                      bottleneck_num_filters=4, num_channels=3, hdr=False)
    with pytest.raises(ValueError, match="flagship"):
        FusedTransfer(variables, plan_from_config(bad))


def test_fused_dual_style_matches_packed(rng):
    """Dual-style fused kernel == packed path: per-pixel blended CIN affines
    streamed through the weight-mip DMA ring (reference
    ``styleTransfer.py:36-44,288-345``)."""
    from realtime_style_transfer_tpu.models.transfer_packed import (
        stylize_packed,
    )

    cfg = ShapeConfig(resolution_divider=15, bottleneck_res_y=16,
                      bottleneck_num_filters=8, num_channels=17, hdr=True,
                      num_styles=2)
    plan = plan_from_config(cfg)
    net = StyleTransferNet(plan=plan, num_styles=2)
    rng = np.random.default_rng(29)
    content = jnp.asarray(
        rng.random((1,) + cfg.content_shape).astype(np.float32))
    style_params = jnp.asarray(
        (rng.random((1, 2, plan.num_style_parameters)) * 0.4 + 0.8)
        .astype(np.float32))
    weights = jnp.asarray(
        rng.random((1,) + cfg.style_weights_shape).astype(np.float32))
    variables = jax.jit(net.init, static_argnames=("train",))(
        jax.random.PRNGKey(5), content, style_params, style_weights=weights,
        train=False)
    want = np.asarray(jax.jit(
        lambda v, c, p, w: stylize_packed(v, c, p, w, plan=plan,
                                          dtype=jnp.bfloat16)
    )(variables, content, style_params, weights), np.float32)
    fused = FusedTransfer(variables, plan, num_styles=2, interpret=True)
    got = np.asarray(fused(content, style_params, weights), np.float32)
    assert got.shape == want.shape == (1,) + cfg.output_shape
    np.testing.assert_allclose(got, want, rtol=0.05, atol=0.02)
    assert np.median(np.abs(got - want)) < 5e-3

    # degenerate all-zero weight map == single-style with style 0
    single = FusedTransfer(variables, plan, interpret=True)
    base = np.asarray(single(content, style_params[:, :1]), np.float32)
    blend0 = np.asarray(
        fused(content, style_params, jnp.zeros_like(weights)), np.float32)
    np.testing.assert_allclose(blend0, base, rtol=0.02, atol=0.01)


def test_dual_wmip_resident_bit_identical_to_ring(rng):
    """The r4 VMEM-resident expand-mip path (wE0/wE1/wFin as resident kernel
    inputs under the raised scoped-VMEM cap) must be bit-identical to the
    streamed DMA-ring structure — same bf16 values, no ring."""
    cfg = ShapeConfig(resolution_divider=15, bottleneck_res_y=16,
                      bottleneck_num_filters=8, num_channels=17, hdr=True,
                      num_styles=2)
    plan = plan_from_config(cfg)
    net = StyleTransferNet(plan=plan, num_styles=2)
    rng = np.random.default_rng(37)
    content = jnp.asarray(
        rng.random((1,) + cfg.content_shape).astype(np.float32))
    style_params = jnp.asarray(
        (rng.random((1, 2, plan.num_style_parameters)) * 0.4 + 0.8)
        .astype(np.float32))
    weights = jnp.asarray(
        rng.random((1,) + cfg.style_weights_shape).astype(np.float32))
    variables = jax.jit(net.init, static_argnames=("train",))(
        jax.random.PRNGKey(9), content, style_params, style_weights=weights,
        train=False)
    ring = FusedTransfer(variables, plan, num_styles=2, interpret=True,
                         wmip_resident=False)
    res = FusedTransfer(variables, plan, num_styles=2, interpret=True,
                        wmip_resident=True)
    assert res._w_all_resident and not ring._w_all_resident
    packed = ring.pack_frame(content)
    want = np.asarray(ring.stylize_prepacked(
        packed, ring.prepare_style(style_params, weights)), np.float32)
    got = np.asarray(res.stylize_prepacked(
        packed, res.prepare_style(style_params, weights)), np.float32)
    np.testing.assert_array_equal(got, want)


def test_fused_dual_style_ring_fallback_matches_packed(rng):
    """Dual-style with ``hp % 8 != 0``: the compact VMEM-resident wB plane
    needs 8-aligned window math, so these plans must fall back to the
    expanded DMA-ring path — and still match the packed oracle
    (reference ``styleTransfer.py:36-44,288-345``)."""
    cfg = ShapeConfig(resolution_divider=20, bottleneck_res_y=12,
                      bottleneck_num_filters=8, num_channels=17, hdr=True,
                      num_styles=2)
    plan = plan_from_config(cfg)
    net = StyleTransferNet(plan=plan, num_styles=2)
    rng = np.random.default_rng(31)
    content = jnp.asarray(
        rng.random((1,) + cfg.content_shape).astype(np.float32))
    style_params = jnp.asarray(
        (rng.random((1, 2, plan.num_style_parameters)) * 0.4 + 0.8)
        .astype(np.float32))
    weights = jnp.asarray(
        rng.random((1,) + cfg.style_weights_shape).astype(np.float32))
    variables = jax.jit(net.init, static_argnames=("train",))(
        jax.random.PRNGKey(7), content, style_params, style_weights=weights,
        train=False)
    want = np.asarray(jax.jit(
        lambda v, c, p, w: stylize_packed(v, c, p, w, plan=plan,
                                          dtype=jnp.bfloat16)
    )(variables, content, style_params, weights), np.float32)
    fused = FusedTransfer(variables, plan, num_styles=2, interpret=True)
    assert not fused._wb_resident  # hp == 12 exercises the fallback
    got = np.asarray(fused(content, style_params, weights), np.float32)
    assert got.shape == want.shape == (1,) + cfg.output_shape
    np.testing.assert_allclose(got, want, rtol=0.05, atol=0.02)
    assert np.median(np.abs(got - want)) < 5e-3


def test_prepared_style_path_matches_direct(flagship_tiny):
    """prepare_style + stylize_prepared == the direct call (streaming path
    hoists the loop-invariant style table out of the frame loop)."""
    _cfg, plan, _net, variables, content, style_params = flagship_tiny
    fused = FusedTransfer(variables, plan, interpret=True)
    direct = np.asarray(fused(content, style_params), np.float32)
    prepared = fused.prepare_style(style_params)
    streamed = np.asarray(
        fused.stylize_prepared(content, prepared), np.float32)
    np.testing.assert_array_equal(direct, streamed)


def test_fused_rejects_wide_bottleneck(flagship_tiny):
    """Plans with >128 bottleneck filters must fail at the constructor (the
    skip ping-pong is one LANE wide), not deep inside kernel tracing."""
    _cfg, _plan, _net, variables, _c, _p = flagship_tiny
    wide = ShapeConfig(resolution_divider=15, bottleneck_res_y=16,
                       bottleneck_num_filters=256, num_channels=17, hdr=True)
    with pytest.raises(ValueError, match="bottleneck filters"):
        FusedTransfer(variables, plan_from_config(wide))


def test_prepacked_input_path_matches_direct(flagship_tiny):
    """Deploy input contract: host numpy pack (pack_frame_np) is bit-identical
    to the device pack, and stylize_prepacked == the direct call."""
    _cfg, plan, _net, variables, content, style_params = flagship_tiny
    fused = FusedTransfer(variables, plan, interpret=True)
    prepared = fused.prepare_style(style_params)
    direct = np.asarray(fused(content, style_params), np.float32)

    packed_dev = jax.jit(fused.pack_frame)(content)
    packed_np = fused.pack_frame_np(np.asarray(content))
    assert packed_np.shape == packed_dev.shape
    np.testing.assert_array_equal(
        np.asarray(packed_dev).view(np.uint16), packed_np.view(np.uint16))

    out = np.asarray(
        fused.stylize_prepacked(jnp.asarray(packed_np), prepared), np.float32)
    np.testing.assert_array_equal(out, direct)

    # fully-packed deploy contract: packed frame in, PACKED frame out (no
    # device-side unpack), host unpack twin reproduces stylize_prepacked
    raw = fused.stylize_prepacked_raw(jnp.asarray(packed_np), prepared)
    assert raw.shape[:2] == packed_np.shape[:2]
    unpacked = fused.unpack_frame_np(np.asarray(raw))
    np.testing.assert_array_equal(unpacked, direct)


def test_chunked_launch_matches_single_frames(flagship_tiny):
    """Chunk mode (grid=(N,) — N frames per kernel launch, throughput path)
    is bit-identical to N single-frame launches."""
    _cfg, plan, _net, variables, content, style_params = flagship_tiny
    fused = FusedTransfer(variables, plan, interpret=True)
    prepared = fused.prepare_style(style_params)
    rng = np.random.default_rng(31)
    frames = rng.random((3,) + content.shape[1:]).astype(np.float32)
    packed = np.stack(
        [fused.pack_frame_np(frames[i:i + 1]) for i in range(3)])
    chunk = np.asarray(
        fused.stylize_prepacked_chunk(jnp.asarray(packed), prepared),
        np.float32)
    singles = np.concatenate([
        np.asarray(
            fused.stylize_prepacked(jnp.asarray(packed[i]), prepared),
            np.float32)
        for i in range(3)])
    assert chunk.shape == (3,) + chunk.shape[1:]
    np.testing.assert_array_equal(chunk, singles)


# ---- divider-1 (3-contract/3-expand) two-segment family --------------------
# rst-1920's shape family (reference shape_config.py:14-15 at
# resolution_divider=1; block math styleTransfer.py:217,258): the fused
# kernel runs stem/c1/c2 + e2/final/finish on the (H/4, W/4) content grid and
# c3/res-core/e0/e1 on the (H/8, W/8) bottleneck grid, with the grid
# transitions folded into c2's and e1's output bands (_Stage.repack).
TINY3 = ShapeConfig(resolution_divider=15, bottleneck_res_y=8,
                    bottleneck_num_filters=8, num_channels=17, hdr=True)


@pytest.fixture(scope="module")
def divider1_tiny():
    rng = np.random.default_rng(21)
    cfg = TINY3
    plan = plan_from_config(cfg)
    assert (plan.num_contract_blocks, plan.num_expand_blocks) == (3, 3)
    net = StyleTransferNet(plan=plan, num_styles=1)
    content = jnp.asarray(
        rng.random((1,) + cfg.content_shape).astype(np.float32))
    style_params = jnp.asarray(
        (rng.random((1, 1, plan.num_style_parameters)) * 0.4 + 0.8)
        .astype(np.float32))
    variables = jax.jit(net.init, static_argnames=("train",))(
        jax.random.PRNGKey(3), content, style_params, train=False)
    return cfg, plan, net, variables, content, style_params


def test_fused_three_seg_matches_packed(divider1_tiny):
    """Two-segment fused kernel == the packed XLA path on a tiny divider-1
    plan.  The oracle runs at f32 (compiling the bf16 packed graph for THIS
    3-contract plan segfaults XLA:CPU on this box — a compiler crash, not a
    semantics issue; the flagship-family bf16 oracle above compiles fine), so
    tolerances cover fused-bf16-vs-f32 rounding."""
    cfg, plan, _net, variables, content, style_params = divider1_tiny
    want = np.asarray(jax.jit(
        lambda v, c, p: stylize_packed(v, c, p, plan=plan, dtype=jnp.float32)
    )(variables, content, style_params), np.float32)

    fused = FusedTransfer(variables, plan, interpret=True)
    assert fused.three_seg
    # both grids appear in the stage table, with one fold and one unfold
    assert [st.repack for st in fused.stages if st.repack] == \
        ["fold2", "unfold2"]
    got = np.asarray(fused(content, style_params), np.float32)
    assert got.shape == want.shape == (1,) + cfg.output_shape
    np.testing.assert_allclose(got, want, rtol=0.05, atol=0.02)
    assert np.median(np.abs(got - want)) < 5e-3


def test_fused_three_seg_prepacked_matches_direct(divider1_tiny):
    """The deploy contracts (host pack twin, prepacked call, raw out +
    host unpack twin) hold on the two-segment kernel too."""
    _cfg, plan, _net, variables, content, style_params = divider1_tiny
    fused = FusedTransfer(variables, plan, interpret=True)
    prepared = fused.prepare_style(style_params)
    direct = np.asarray(fused(content, style_params), np.float32)

    packed_np = fused.pack_frame_np(np.asarray(content))
    packed_dev = jax.jit(fused.pack_frame)(content)
    np.testing.assert_array_equal(
        np.asarray(packed_dev).view(np.uint16), packed_np.view(np.uint16))
    out = np.asarray(
        fused.stylize_prepacked(jnp.asarray(packed_np), prepared), np.float32)
    np.testing.assert_array_equal(out, direct)

    raw = fused.stylize_prepacked_raw(jnp.asarray(packed_np), prepared)
    unpacked = fused.unpack_frame_np(np.asarray(raw))
    np.testing.assert_array_equal(unpacked, direct)


def test_fused_three_seg_rejects_dual(divider1_tiny):
    """Dual-style is not yet wired for the 3-contract family: the weight-mip
    ring is keyed to the single-grid schedule — must fail at the constructor."""
    _cfg, plan, _net, variables, _c, _p = divider1_tiny
    with pytest.raises(ValueError, match="dual-style"):
        FusedTransfer(variables, plan, num_styles=2)


def test_dual_wb_expanded_bit_identical_to_compact(rng):
    """The r5 wB-layout A/B (RST_FUSED_WB_EXPANDED): shipping the bottleneck
    weight mip pre-expanded + VMEM-resident must be bit-identical to the
    compact-plane path (same f32 values, same bf16 rounding point — only the
    broadcast moves from in-kernel roll/lane-insert to host prep)."""
    cfg = ShapeConfig(resolution_divider=15, bottleneck_res_y=16,
                      bottleneck_num_filters=8, num_channels=17, hdr=True,
                      num_styles=2)
    plan = plan_from_config(cfg)
    net = StyleTransferNet(plan=plan, num_styles=2)
    content = jnp.asarray(
        rng.random((1,) + cfg.content_shape).astype(np.float32))
    sp = jnp.asarray(
        (rng.random((1, 2, plan.num_style_parameters)) * 0.4 + 0.8)
        .astype(np.float32))
    h, w, _ = cfg.content_shape
    yy = np.linspace(0, 1, h, dtype=np.float32)[None, :, None, None]
    weights = jnp.asarray(np.broadcast_to(yy, (1, h, w, 1)).copy())
    variables = jax.device_get(jax.jit(net.init, static_argnames=("train",))(
        jax.random.PRNGKey(3), content, sp, train=False,
        style_weights=weights))
    compact = FusedTransfer(variables, plan, num_styles=2, interpret=True,
                            wb_expanded=False)
    expanded = FusedTransfer(variables, plan, num_styles=2, interpret=True,
                             wb_expanded=True)
    assert compact._wb_resident and not expanded._wb_resident
    ga = np.asarray(compact(content, sp, weights), np.float32)
    gb = np.asarray(expanded(content, sp, weights), np.float32)
    np.testing.assert_array_equal(ga, gb)
