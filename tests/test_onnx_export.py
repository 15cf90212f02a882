"""ONNX export: emitted graphs parse back and EXECUTE to the JAX model outputs.

Parity target: the reference exports ``predictor.onnx`` + ``transfer.onnx`` for
the Unreal engine runtime (``/root/reference/save_using_checkpoint.py:90-103``).
These tests validate our first-party emission semantically: the bytes are parsed
by ``export/onnx_numpy.py`` (an independent implementation of the ONNX operator
spec) and executed on random inputs; outputs must match ``model.apply``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from realtime_style_transfer_tpu.config import ShapeConfig
from realtime_style_transfer_tpu.export import (
    export_predictor_onnx,
    export_transfer_onnx,
)
from realtime_style_transfer_tpu.export.onnx_numpy import parse_model, run_model
from realtime_style_transfer_tpu.models.transfer import (
    StyleTransferNet,
    make_transfer_plan,
)


def _transfer_setup(spec):
    cfg = ShapeConfig.from_spec(spec)
    plan = make_transfer_plan(
        cfg.content_shape, cfg.output_shape, cfg.bottleneck_res_y,
        cfg.bottleneck_num_filters,
    )
    net = StyleTransferNet(plan=plan)
    rng = np.random.default_rng(7)
    content = rng.random((1,) + cfg.content_shape).astype(np.float32)
    style_params = rng.standard_normal(
        (1, 1, plan.num_style_parameters)
    ).astype(np.float32) * 0.1
    variables = jax.jit(net.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), jnp.asarray(content), jnp.asarray(style_params),
        train=False,
    )
    return cfg, plan, net, variables, content, style_params


@pytest.mark.parametrize("spec", ["rst-120-15-4-3", "rst-240-15-4-6"])
def test_transfer_onnx_matches_jax(spec):
    cfg, plan, net, variables, content, style_params = _transfer_setup(spec)
    model_bytes = export_transfer_onnx(variables, plan)

    expected = np.asarray(
        net.apply(variables, jnp.asarray(content), jnp.asarray(style_params),
                  train=False)
    )
    got = run_model(
        model_bytes,
        {"content": content, "style_params": style_params[:, 0, :]},
    )["stylized"]
    assert got.shape == expected.shape == (1,) + cfg.output_shape
    np.testing.assert_allclose(got, expected, rtol=1e-3, atol=1e-4)


def test_transfer_onnx_structure():
    _cfg, plan, _net, variables, _c, _p = _transfer_setup("rst-120-15-4-3")
    model_bytes = export_transfer_onnx(variables, plan)
    nodes, initializers, inputs, outputs = parse_model(model_bytes)
    assert inputs == ["content", "style_params"]
    assert outputs == ["stylized"]
    op_types = [n[0] for n in nodes]
    # expand blocks with stride 2 must be ConvTranspose; final 9x9 is a Conv
    assert op_types.count("ConvTranspose") == plan.num_expand_blocks
    assert "Sigmoid" in op_types and "BatchNormalization" in op_types
    # every style-param slice lands as a Slice node: 2 per CIN
    num_cin = 2 * 5 + len(plan.expand_blocks)
    assert op_types.count("Slice") == 2 * num_cin
    # all initializers are named, finite tensors
    for name, arr in initializers.items():
        assert name and np.isfinite(arr).all()


@pytest.mark.parametrize(
    "extractor,hw",
    [("dummy", (60, 120)),
     # 33 s: the MobileNet tower through the numpy ONNX interpreter; the
     # dummy variant covers the predictor head ops in the default tier
     pytest.param("mobilenet", (64, 96), marks=pytest.mark.slow)])
def test_predictor_onnx_matches_jax(extractor, hw):
    from realtime_style_transfer_tpu.models.predictor import StylePredictor

    num_top = 50
    module = StylePredictor(num_top_parameters=num_top,
                            feature_extractor=extractor)
    rng = np.random.default_rng(3)
    style = rng.random((1,) + hw + (3,)).astype(np.float32)
    variables = jax.jit(module.init, static_argnames=("train",))(
        jax.random.PRNGKey(1), jnp.asarray(style), train=False
    )
    expected = np.asarray(
        module.apply(variables, jnp.asarray(style), train=False)
    )
    model_bytes = export_predictor_onnx(
        variables, style_shape=hw + (3,), num_top_parameters=num_top,
        feature_extractor=extractor,
    )
    got = run_model(model_bytes, {"style": style})["style_params"]
    assert got.shape == expected.shape == (1, num_top)
    np.testing.assert_allclose(got, expected, rtol=1e-3, atol=1e-4)


def test_predictor_onnx_rejects_unsupported_extractor():
    with pytest.raises(ValueError, match="dummy/mobilenet"):
        export_predictor_onnx(
            {"params": {}}, style_shape=(32, 32, 3), num_top_parameters=8,
            feature_extractor="efficientnet",
        )


def test_transfer_onnx_golden_bytes():
    """Byte-exact golden: the emitted proto for the committed reference-fixture
    weights must not drift (encoder regressions can't hide behind the
    co-evolving numpy interpreter), and the IR header constants must match the
    ONNX spec values the engine runtime expects (ir_version 8, opset 13)."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    from convert_keras_weights import convert_transfer

    from realtime_style_transfer_tpu.models.inference import plan_from_config

    golden_path = Path(__file__).parent / "golden" / "transfer_tiny_reference.onnx"
    w = np.load(
        Path(__file__).parent / "golden" / "reference" / "transfer_tiny"
        / "weights.npz")
    variables = jax.tree.map(jnp.asarray, convert_transfer(w))
    cfg = ShapeConfig(resolution_divider=15, bottleneck_res_y=16,
                      bottleneck_num_filters=8, num_channels=17, hdr=True)
    data = export_transfer_onnx(variables, plan_from_config(cfg))
    golden = golden_path.read_bytes()
    assert data == golden, (
        f"emitted ONNX bytes drifted from golden ({len(data)} vs {len(golden)})")

    # spot-check spec-level field constants straight off the wire:
    # field 1 (ir_version, varint) = 8 -> bytes 0x08 0x08
    assert golden[:2] == b"\x08\x08"
    # opset_import (field 8) holds OperatorSetIdProto with version (field 2) 13
    from realtime_style_transfer_tpu.utils.proto import parse_fields
    fields = list(parse_fields(golden))
    opsets = [v for f, _w, v in fields if f == 8]
    assert len(opsets) == 1
    opset_fields = dict((f, v) for f, _w, v in parse_fields(opsets[0]))
    assert opset_fields[2] == 13  # opset 13
    assert opset_fields.get(1, b"") == b""  # default ai.onnx domain
