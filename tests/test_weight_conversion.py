"""Keras weight-conversion proofs against numpy oracles of the TF op semantics.

The reference's trained weights live in TF/Keras layouts
(``/root/reference/realtime_style_transfer/models/styleLoss.py:73-76`` VGG16,
``stylePrediction.py:33-45`` MobileNetV3, ``styleTransfer.py:115-128``
Conv2DTranspose).  No TF exists in this image, so the converter math is proven
here offline: fabricate Keras-layout npz fixtures with known values, convert,
and check our modules reproduce hand-rolled numpy implementations of the exact
TF op semantics (SAME padding arithmetic included).
"""

import io
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from convert_keras_weights import (  # noqa: E402
    convert_conv_transpose_kernel,
    convert_mobilenetv3,
    convert_transfer,
    convert_vgg16,
)


# ---------------------------------------------------------------------------
# numpy oracles of TF op semantics
# ---------------------------------------------------------------------------


def tf_conv2d_same_oracle(x, kernel, stride):
    """``tf.keras.layers.Conv2D(..., padding='same')``: direct-loop numpy.

    TF SAME: out = ceil(in/s); total_pad = max((out-1)*s + k - in, 0);
    pad_before = total_pad // 2.
    """
    h, w, cin = x.shape
    kh, kw, _, cout = kernel.shape
    oh, ow = -(-h // stride), -(-w // stride)
    pb_y = max((oh - 1) * stride + kh - h, 0) // 2
    pb_x = max((ow - 1) * stride + kw - w, 0) // 2
    out = np.zeros((oh, ow, cout), np.float64)
    for p in range(oh):
        for q in range(ow):
            for dy in range(kh):
                for dx in range(kw):
                    iy, ix = p * stride + dy - pb_y, q * stride + dx - pb_x
                    if 0 <= iy < h and 0 <= ix < w:
                        out[p, q] += x[iy, ix] @ kernel[dy, dx]
    return out


def tf_conv2d_transpose_same_oracle(x, kernel_tf, stride):
    """``tf.keras.layers.Conv2DTranspose(..., padding='same')``: the gradient
    of the SAME forward conv, by direct loops.

    ``kernel_tf`` is in the Keras transpose layout ``(kh, kw, out, in)``.
    Output spatial size is ``in * stride``.
    """
    h, w, cin = x.shape
    kh, kw, cout, _ = kernel_tf.shape
    oh, ow = h * stride, w * stride
    # padding of the FORWARD conv this op is the gradient of
    pb_y = max(kh - stride, 0) // 2
    pb_x = max(kw - stride, 0) // 2
    out = np.zeros((oh, ow, cout), np.float64)
    for p in range(h):
        for q in range(w):
            for dy in range(kh):
                for dx in range(kw):
                    oy, ox = p * stride + dy - pb_y, q * stride + dx - pb_x
                    if 0 <= oy < oh and 0 <= ox < ow:
                        # k[dy, dx] maps (out, in): out += k @ x
                        out[oy, ox] += kernel_tf[dy, dx] @ x[p, q]
    return out


def tf_batchnorm_inference_oracle(x, gamma, beta, mean, var, eps):
    return gamma * (x - mean) / np.sqrt(var + eps) + beta


# ---------------------------------------------------------------------------
# Conv2DTranspose kernel conversion (the previously-unimplemented mapping)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "kh,stride,cin,cout,h,w",
    [(3, 2, 5, 4, 6, 7), (3, 2, 4, 3, 5, 5), (9, 1, 3, 2, 8, 6)],
)
def test_conv_transpose_conversion_matches_tf_oracle(rng, kh, stride, cin, cout,
                                                     h, w):
    from realtime_style_transfer_tpu.models.transfer import FastConvTranspose

    x = rng.standard_normal((h, w, cin)).astype(np.float32)
    k_tf = rng.standard_normal((kh, kh, cout, cin)).astype(np.float32)
    bias = rng.standard_normal((cout,)).astype(np.float32)

    oracle = tf_conv2d_transpose_same_oracle(x, k_tf, stride) + bias

    module = FastConvTranspose(
        features=cout, kernel_size=(kh, kh), strides=(stride, stride)
    )
    variables = {
        "params": {
            "kernel": jnp.asarray(convert_conv_transpose_kernel(k_tf)),
            "bias": jnp.asarray(bias),
        }
    }
    ours = np.asarray(module.apply(variables, jnp.asarray(x)[None]))[0]
    np.testing.assert_allclose(ours, oracle, rtol=1e-4, atol=1e-4)


def test_conv2d_identity_mapping_matches_tf_oracle(rng):
    """Keras Conv2D kernels map 1:1 (HWIO both sides) — prove SAME semantics."""
    from realtime_style_transfer_tpu.models.transfer import FastConv

    for kh, stride in ((3, 2), (9, 1), (3, 1)):
        x = rng.standard_normal((8, 12, 5)).astype(np.float32)
        kernel = rng.standard_normal((kh, kh, 5, 4)).astype(np.float32)
        bias = rng.standard_normal((4,)).astype(np.float32)
        oracle = tf_conv2d_same_oracle(x, kernel, stride) + bias
        module = FastConv(features=4, kernel_size=(kh, kh),
                          strides=(stride, stride))
        ours = np.asarray(
            module.apply(
                {"params": {"kernel": jnp.asarray(kernel),
                            "bias": jnp.asarray(bias)}},
                jnp.asarray(x)[None],
            )
        )[0]
        np.testing.assert_allclose(ours, oracle, rtol=1e-4, atol=1e-4)


def test_batchnorm_mapping_matches_tf_oracle(rng):
    """gamma/beta/moving_* -> flax scale/bias/mean/var with eps 1e-3."""
    import flax.linen as nn

    c = 6
    x = rng.standard_normal((2, 4, 4, c)).astype(np.float32)
    gamma = rng.standard_normal((c,)).astype(np.float32)
    beta = rng.standard_normal((c,)).astype(np.float32)
    mean = rng.standard_normal((c,)).astype(np.float32)
    var = rng.random((c,)).astype(np.float32) + 0.5
    oracle = tf_batchnorm_inference_oracle(x, gamma, beta, mean, var, 1e-3)
    bn = nn.BatchNorm(use_running_average=True, epsilon=1e-3, momentum=0.99)
    ours = np.asarray(
        bn.apply(
            {"params": {"scale": gamma, "bias": beta},
             "batch_stats": {"mean": mean, "var": var}},
            jnp.asarray(x),
        )
    )
    np.testing.assert_allclose(ours, oracle, rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# Full-tree conversions: fabricate Keras-layout npz from our init trees
# (inverse mapping), convert, and require exact round-trip equality.
# ---------------------------------------------------------------------------


def _npz(arrays: dict):
    buf = io.BytesIO()
    np.savez(buf, **arrays)
    buf.seek(0)
    return np.load(buf)


def test_vgg16_conversion_structure(rng):
    from realtime_style_transfer_tpu.models.backbones.vgg import VGG16Features

    module = VGG16Features()
    init = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    fixture = {}
    for layer, leaves in init["params"].items():
        for leaf, v in leaves.items():
            # the exact Keras weight-name layout: "<layer>/<leaf>:0"
            fixture[f"vgg16/{layer}/{leaf}:0"] = rng.standard_normal(
                v.shape
            ).astype(np.float32)
    converted = convert_vgg16(_npz(fixture))
    assert jax.tree_util.tree_structure(converted["params"]) == (
        jax.tree_util.tree_structure(jax.device_get(init["params"]))
    )
    for layer, leaves in converted["params"].items():
        for leaf, v in leaves.items():
            assert v.shape == init["params"][layer][leaf].shape
            np.testing.assert_array_equal(v, fixture[f"vgg16/{layer}/{leaf}:0"])


def test_vgg16_conversion_missing_layer_fails():
    with pytest.raises(SystemExit, match="missing"):
        convert_vgg16(_npz({"vgg16/block1_conv1/kernel:0": np.zeros((3, 3, 3, 4))}))


def test_mobilenetv3_conversion_structure():
    from realtime_style_transfer_tpu.models.backbones.mobilenetv3 import (
        MOBILENETV3_SMALL_BLOCKS,
        MobileNetV3Small,
    )

    module = MobileNetV3Small()
    init = jax.jit(module.init)(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    init = jax.device_get(init)

    # Inverse mapping: fabricate the exact Keras key/shape layout from our tree.
    fixture = {}

    def bn(dst_module, dst_name, src_prefix):
        p = init["params"]
        s = init["batch_stats"]
        for part in dst_module:
            p, s = p[part], s[part]
        fixture[f"{src_prefix}/gamma:0"] = p[dst_name]["scale"]
        fixture[f"{src_prefix}/beta:0"] = p[dst_name]["bias"]
        fixture[f"{src_prefix}/moving_mean:0"] = s[dst_name]["mean"]
        fixture[f"{src_prefix}/moving_variance:0"] = s[dst_name]["var"]

    fixture["Conv/kernel:0"] = init["params"]["stem_conv"]["kernel"]
    bn((), "stem_bn", "Conv/BatchNorm")
    fixture["Conv_1/kernel:0"] = init["params"]["last_conv"]["kernel"]
    bn((), "last_bn", "Conv_1/BatchNorm")
    for i, (_k, _exp, _out, use_se, _act, _s) in enumerate(
        MOBILENETV3_SMALL_BLOCKS
    ):
        src = "expanded_conv" if i == 0 else f"expanded_conv_{i}"
        block = init["params"][src]
        if i > 0:
            fixture[f"{src}/expand/kernel:0"] = block["expand"]["kernel"]
            bn((src,), "expand_bn", f"{src}/expand/BatchNorm")
        # ours (H, W, 1, C) -> Keras depthwise (H, W, C, 1)
        fixture[f"{src}/depthwise/depthwise_kernel:0"] = np.transpose(
            block["depthwise"]["kernel"], (0, 1, 3, 2)
        )
        bn((src,), "depthwise_bn", f"{src}/depthwise/BatchNorm")
        if use_se:
            fixture[f"{src}/squeeze_excite/Conv/kernel:0"] = (
                block["se"]["se_reduce"]["kernel"])
            fixture[f"{src}/squeeze_excite/Conv/bias:0"] = (
                block["se"]["se_reduce"]["bias"])
            fixture[f"{src}/squeeze_excite/Conv_1/kernel:0"] = (
                block["se"]["se_expand"]["kernel"])
            fixture[f"{src}/squeeze_excite/Conv_1/bias:0"] = (
                block["se"]["se_expand"]["bias"])
        fixture[f"{src}/project/kernel:0"] = block["project"]["kernel"]
        bn((src,), "project_bn", f"{src}/project/BatchNorm")

    converted = convert_mobilenetv3(_npz(fixture))
    flat_ours, tree_ours = jax.tree_util.tree_flatten_with_path(converted)
    flat_init, tree_init = jax.tree_util.tree_flatten_with_path(
        {"params": init["params"], "batch_stats": init["batch_stats"]}
    )
    assert tree_ours == tree_init
    for (path_a, a), (path_b, b) in zip(flat_ours, flat_init):
        assert path_a == path_b
        assert a.shape == b.shape, path_a
        np.testing.assert_array_equal(a, b)


def test_transfer_conversion_loads_and_runs(rng):
    """Fabricated canonical transfer dump -> converted tree == init structure,
    loads into StyleTransferNet.apply, and the ConvTranspose layers reproduce
    the TF oracle through the whole converted model's expand params."""
    from realtime_style_transfer_tpu.config import ShapeConfig
    from realtime_style_transfer_tpu.models.transfer import (
        StyleTransferNet,
        make_transfer_plan,
    )

    cfg = ShapeConfig.from_spec("rst-120-15-4-3")
    plan = make_transfer_plan(
        cfg.content_shape, cfg.output_shape, cfg.bottleneck_res_y,
        cfg.bottleneck_num_filters,
    )
    net = StyleTransferNet(plan=plan)
    content = jnp.zeros((1,) + cfg.content_shape)
    style_params = jnp.zeros((1, 1, plan.num_style_parameters))
    init = jax.device_get(
        jax.jit(net.init, static_argnames=("train",))(
            jax.random.PRNGKey(0), content, style_params, train=False
        )
    )

    fixture = {}
    for layer, leaves in init["params"].items():
        if layer.endswith("_bn"):
            fixture[f"{layer}/gamma"] = rng.random(
                leaves["scale"].shape).astype(np.float32)
            fixture[f"{layer}/beta"] = rng.random(
                leaves["bias"].shape).astype(np.float32)
            stats = init["batch_stats"][layer]
            fixture[f"{layer}/moving_mean"] = rng.random(
                stats["mean"].shape).astype(np.float32)
            fixture[f"{layer}/moving_variance"] = (
                rng.random(stats["var"].shape).astype(np.float32) + 0.5)
            continue
        for leaf, v in leaves.items():
            shape = v.shape
            if leaf == "kernel" and layer.startswith("expand_"):
                kh, kw, i, o = shape
                shape = (kh, kw, o, i)  # Keras transpose layout (out, in)
            fixture[f"{layer}/{leaf}"] = rng.standard_normal(shape).astype(
                np.float32)

    converted = convert_transfer(_npz(fixture))
    # exact structural match with the module's own init -> checkpoint-loadable
    assert jax.tree_util.tree_structure(converted) == (
        jax.tree_util.tree_structure(
            {"params": init["params"], "batch_stats": init["batch_stats"]}
        )
    )
    for layer, leaves in converted["params"].items():
        for leaf, v in leaves.items():
            assert v.shape == init["params"][layer][leaf].shape, (layer, leaf)

    # converted variables actually run
    out = net.apply(
        converted, content,
        jnp.asarray(rng.standard_normal((1, 1, plan.num_style_parameters)),
                    jnp.float32),
        train=False,
    )
    assert out.shape == (1,) + cfg.output_shape
    assert np.isfinite(np.asarray(out)).all()

    # and the converted expand kernels reproduce the TF transpose-conv oracle
    k_tf = fixture["expand_0_conv/kernel"]
    k_ours = converted["params"]["expand_0_conv"]["kernel"]
    x = rng.standard_normal((5, 6, k_tf.shape[3])).astype(np.float32)
    oracle = tf_conv2d_transpose_same_oracle(x, k_tf, 2)
    got = np.asarray(
        jax.lax.conv_transpose(
            jnp.asarray(x)[None], jnp.asarray(k_ours), (2, 2), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
    )[0]
    np.testing.assert_allclose(got, oracle, rtol=1e-4, atol=1e-4)
