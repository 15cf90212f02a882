#!/usr/bin/env python
"""Run the ACTUAL TensorFlow reference as a numeric oracle and dump its
random-init weights plus input/output pairs for parity testing.

This script must run in a TF-capable process and never imports jax (the
machine-wide sitecustomize pins JAX_PLATFORMS; TF is unaffected).  It imports
the reference from ``/root/reference`` *as a library* — nothing is copied —
builds the requested model, dumps every weight under the key grammar that
``tools/convert_keras_weights.py`` consumes, runs the model on seeded random
inputs, and writes two npz files into the output directory:

* ``weights.npz`` — exactly the converter's input format
* ``io.npz``      — the seeded inputs, the reference outputs, and metadata

Subcommands map to the reference entry points they oracle:

* ``transfer``  — ``realtime_style_transfer/models/styleTransfer.py:213``
  (``create_style_transfer_model``), single- or multi-style
* ``predictor`` — ``stylePrediction.py:25`` (``create_style_prediction_model``)
  with the dummy or MobileNetV3-Small extractor
* ``vgg16``     — ``tf.keras.applications.VGG16(include_top=False)`` tap dump
  at the reference loss model's tap layers (``styleLoss.py:79-80``)
* ``loss``      — ``styleLoss.py:295`` (``make_style_loss_function``) over the
  Dummy or VGG extractor, depth loss off

Pretrained-weight downloads are impossible in this zero-egress image, so
``keras.applications`` factories are patched to ``weights=None`` — parity is
checked on the *shared random weights* dumped here, which proves the math
(conv semantics, padding, BN epsilons, preprocessing, loss formulas)
independently of which checkpoint is loaded.
"""

from __future__ import annotations

import argparse
import os
import sys
import types
from pathlib import Path

os.environ.setdefault("TF_USE_LEGACY_KERAS", "1")
os.environ.setdefault("CUDA_VISIBLE_DEVICES", "-1")
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

import numpy as np

REFERENCE_ROOT = "/root/reference"


def _import_reference():
    """Put the reference on sys.path and stub its absent optional deps."""
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    # tensorflow_probability / tensorflow_hub are absent here and only used by
    # the depth-loss path (styleLoss.py:250-287), which we never invoke.
    for name in ("tensorflow_probability", "tensorflow_hub"):
        if name not in sys.modules:
            stub = types.ModuleType(name)
            stub.stats = types.SimpleNamespace(percentile=None)
            sys.modules[name] = stub


def _patch_applications_random_init():
    """Force keras.applications factories to weights=None (zero egress)."""
    import tensorflow as tf

    def wrap(fn):
        def patched(*args, **kwargs):
            kwargs["weights"] = None
            return fn(*args, **kwargs)

        return patched

    apps = tf.keras.applications
    for attr in ("VGG16", "MobileNetV3Small", "EfficientNetV2S"):
        if hasattr(apps, attr):
            setattr(apps, attr, wrap(getattr(apps, attr)))
    if hasattr(apps, "efficientnet"):
        apps.efficientnet.EfficientNetB3 = wrap(apps.efficientnet.EfficientNetB3)
    if hasattr(apps, "efficientnet_v2"):
        apps.efficientnet_v2.EfficientNetV2S = wrap(
            apps.efficientnet_v2.EfficientNetV2S
        )


def _save(out_dir: Path, weights: dict, io: dict) -> None:
    out_dir.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(out_dir / "weights.npz", **weights)
    np.savez_compressed(out_dir / "io.npz", **io)
    n = sum(int(np.prod(v.shape)) for v in weights.values())
    print(f"wrote {out_dir}: {len(weights)} weight arrays ({n:,} values), "
          f"{len(io)} io arrays")


# --------------------------------------------------------------------------
# transfer net
# --------------------------------------------------------------------------

def dump_transfer_weights(model, num_contract: int, num_expand: int) -> dict:
    """Actual reference layer names -> the converter's npz key grammar.

    The reference builds contract blocks as sub-models ``contract_start,
    contract_0, ...`` (conv ``{name}_conv`` + one BatchNormalization),
    residual sub-models ``residual_block_{i}`` (convs ``{name}_conv{j}``),
    and expand sub-models ``expand_0..expand_last`` (Conv2DTranspose
    ``{name}_conv``) — see ``styleTransfer.py:95-205``.
    """
    import tensorflow as tf

    out = {}
    contract_names = ["start"] + [str(i) for i in range(num_contract)]
    for ci, nm in enumerate(contract_names):
        sub = model.get_layer(f"contract_{nm}")
        conv = sub.get_layer(f"contract_{nm}_conv")
        bn = next(
            layer
            for layer in sub.layers
            if isinstance(layer, tf.keras.layers.BatchNormalization)
        )
        kernel, bias = (w.numpy() for w in conv.weights)
        out[f"contract_{ci}_conv/kernel"] = kernel
        out[f"contract_{ci}_conv/bias"] = bias
        for w, key in zip(
            bn.weights, ("gamma", "beta", "moving_mean", "moving_variance")
        ):
            out[f"contract_{ci}_bn/{key}"] = w.numpy()
    for ri in range(5):
        sub = model.get_layer(f"residual_block_{ri}")
        for ci in range(2):
            conv = sub.get_layer(f"residual_block_{ri}_conv{ci}")
            out[f"residual_{ri}_conv{ci}/kernel"] = conv.weights[0].numpy()
            out[f"residual_{ri}_conv{ci}/bias"] = conv.weights[1].numpy()
    expand_names = [str(i) for i in range(num_expand)] + ["last"]
    for ei, nm in enumerate(expand_names):
        conv = model.get_layer(f"expand_{nm}").get_layer(f"expand_{nm}_conv")
        out[f"expand_{ei}_conv/kernel"] = conv.weights[0].numpy()
        out[f"expand_{ei}_conv/bias"] = conv.weights[1].numpy()
    return out


def cmd_transfer(args) -> None:
    _import_reference()
    import math

    from realtime_style_transfer.models.styleTransfer import (
        create_style_transfer_model,
    )

    input_shape = (args.height, args.width, args.channels)
    output_shape = (args.height, args.width, 3)
    model, num_style_params = create_style_transfer_model(
        input_shape, output_shape, args.bottleneck_y, args.filters,
        num_styles=args.num_styles,
    )
    num_contract = math.ceil(math.log2(args.height) - math.log2(args.bottleneck_y))
    num_expand = math.ceil(math.log2(args.height) - math.log2(args.bottleneck_y))
    weights = dump_transfer_weights(model, num_contract, num_expand)

    rng = np.random.default_rng(args.seed)
    content = rng.uniform(size=(1,) + input_shape).astype(np.float32)
    style_params = (
        rng.standard_normal((1, args.num_styles, num_style_params)) * 0.4 + 0.8
    ).astype(np.float32)
    inputs = {"content": content, "style_params": style_params}
    io = {
        "content": content,
        "style_params": style_params,
        "num_style_params": np.int64(num_style_params),
        "bottleneck_y": np.int64(args.bottleneck_y),
        "filters": np.int64(args.filters),
        "num_styles": np.int64(args.num_styles),
    }
    if args.num_styles > 1:
        style_weights = rng.uniform(
            size=(1, args.height, args.width, args.num_styles - 1)
        ).astype(np.float32)
        inputs["style_weights"] = style_weights
        io["style_weights"] = style_weights
    io["output"] = np.asarray(model(inputs, training=False), dtype=np.float32)
    _save(Path(args.out), weights, io)


# --------------------------------------------------------------------------
# style predictor
# --------------------------------------------------------------------------

def cmd_predictor(args) -> None:
    _import_reference()
    _patch_applications_random_init()
    from realtime_style_transfer.models.stylePrediction import (
        StyleFeatureExtractor,
        create_style_prediction_model,
    )

    extractor = {
        "dummy": StyleFeatureExtractor.DUMMY,
        "mobilenet": StyleFeatureExtractor.MOBILE_NET,
        "efficientnet": StyleFeatureExtractor.EFFICIENT_NET,
    }[args.extractor]
    input_shape = (args.height, args.width, 3)
    model = create_style_prediction_model(input_shape, extractor, args.num_top)

    weights = {w.name: w.numpy() for layer in model.layers for w in layer.weights}
    rng = np.random.default_rng(args.seed)
    image = rng.uniform(size=(2,) + input_shape).astype(np.float32)
    out = np.asarray(model(image, training=False), dtype=np.float32)
    io = {
        "image": image,
        "output": out,
        "num_top": np.int64(args.num_top),
        "extractor": np.bytes_(args.extractor.encode()),
    }
    if args.extractor in ("mobilenet", "efficientnet"):
        # Random-init backbone features collapse to tiny magnitudes, so the
        # end-to-end output is bias-dominated; dump backbone taps (the loss
        # model's tap layers, styleLoss.py:160-169 / the V2-S stage ends)
        # + final features for a meaningful relative-tolerance comparison.
        import tensorflow as tf

        needle = "obilenet" if args.extractor == "mobilenet" else "fficientnet"
        backbone = next(
            layer for layer in model.layers
            if isinstance(layer, tf.keras.Model) and needle in layer.name
        )
        if args.extractor == "mobilenet":
            tap_names = [
                "expanded_conv_2/Add", "expanded_conv_4/Add",
                "expanded_conv_5/Add", "expanded_conv_7/Add",
                "expanded_conv_9/Add", "expanded_conv_10/Add",
            ]
        else:
            tap_names = ["block1b_add", "block2d_add", "block3d_add",
                         "block4f_add", "block5i_add"]
        outputs = {n: backbone.get_layer(n).output for n in tap_names}
        outputs["features"] = backbone.output
        tap_model = tf.keras.Model(backbone.input, outputs)
        taps = tap_model(image * 2.0 - 1.0, training=False)
        for name, value in taps.items():
            io[f"tap/{name}"] = np.asarray(value, dtype=np.float32)
    _save(Path(args.out), weights, io)


# --------------------------------------------------------------------------
# EfficientNetB3 loss-tower tap dump
# --------------------------------------------------------------------------

def cmd_efficientnet_b3(args) -> None:
    """Reference ``StyleLossModelEfficientNet`` taps (``styleLoss.py:112-152``).

    The reference as written does not construct under ANY Keras that ships v1
    EfficientNet: ``efficientnet.EfficientNetB3`` never grew the v2 family's
    ``include_preprocessing`` kwarg, so ``styleLoss.py:135-137`` raises
    ``TypeError`` (bit-rot; TF 2.9 and today's tf_keras alike).  The minimal
    shim that makes it run is dropping the unsupported kwarg — which means the
    v1 graph's baked-in ``Rescaling(1/255)`` + ``Normalization`` stay, exactly
    what ``models.backbones.efficientnet.EfficientNetB3`` mirrors.
    """
    _import_reference()
    _patch_applications_random_init()
    import tensorflow as tf

    apps = tf.keras.applications
    orig = apps.efficientnet.EfficientNetB3

    def shimmed(*a, **kw):
        kw.pop("include_preprocessing", None)
        return orig(*a, **kw)

    apps.efficientnet.EfficientNetB3 = shimmed
    from realtime_style_transfer.models.styleLoss import (
        StyleLossModelEfficientNet,
    )

    input_shape = (args.height, args.width, 3)
    model = StyleLossModelEfficientNet(input_shape)
    fe = model.feature_extractor
    weights = {w.name: w.numpy() for layer in fe.layers for w in layer.weights}

    rng = np.random.default_rng(args.seed)
    image = rng.uniform(size=(2,) + input_shape).astype(np.float32)
    # feature_extractor's input is the raw B3 input; the loss model's call
    # applies Rescaling(2, -1) first (styleLoss.py:149-152)
    taps = fe(image * 2.0 - 1.0, training=False)
    io = {"image": image,
          "style_layers": np.bytes_("\n".join(model.style_layers).encode()),
          "content_layers": np.bytes_(
              "\n".join(model.content_layers).encode())}
    for name, value in taps.items():
        io[f"tap/{name}"] = np.asarray(value, dtype=np.float32)
    _save(Path(args.out), weights, io)


# --------------------------------------------------------------------------
# VGG16 tap dump
# --------------------------------------------------------------------------

def cmd_vgg16(args) -> None:
    _import_reference()
    _patch_applications_random_init()
    import tensorflow as tf

    vgg = tf.keras.applications.VGG16(include_top=False)
    tap_names = [
        "block1_conv2", "block2_conv2", "block3_conv3", "block4_conv3",
        "block5_conv3",
    ]
    taps = tf.keras.Model(
        [vgg.input], {n: vgg.get_layer(n).output for n in tap_names}
    )
    weights = {w.name: w.numpy() for layer in vgg.layers for w in layer.weights}

    rng = np.random.default_rng(args.seed)
    # caffe-preprocessed scale: what styleLoss.py:107-108 feeds the tower
    images01 = rng.uniform(size=(1, args.height, args.width, 3)).astype(np.float32)
    preprocessed = tf.keras.applications.vgg16.preprocess_input(images01 * 255.0)
    outs = taps(preprocessed, training=False)
    io = {"images01": images01}
    for name in tap_names:
        io[f"tap/{name}"] = np.asarray(outs[name], dtype=np.float32)
    _save(Path(args.out), weights, io)


# --------------------------------------------------------------------------
# loss tower
# --------------------------------------------------------------------------

def cmd_loss(args) -> None:
    _import_reference()
    _patch_applications_random_init()
    import tensorflow as tf

    from realtime_style_transfer.models.styleLoss import (
        StyleLossModelDummy,
        StyleLossModelVGG,
        make_style_loss_function,
    )

    output_shape = (args.height, args.width, 3)
    if args.extractor == "dummy":
        extractor = StyleLossModelDummy(output_shape)
    elif args.extractor == "vgg":
        extractor = StyleLossModelVGG(output_shape)
    else:
        raise SystemExit(f"unsupported loss extractor {args.extractor}")

    compute_loss, _model = make_style_loss_function(
        extractor, output_shape, num_styles=1, with_depth_loss=False
    )
    weights = {
        w.name: w.numpy()
        for layer in extractor.feature_extractor.layers
        for w in layer.weights
    }

    rng = np.random.default_rng(args.seed)
    prediction = rng.uniform(size=(2,) + output_shape).astype(np.float32)
    gt_content = rng.uniform(size=(2,) + output_shape).astype(np.float32)
    gt_style = rng.uniform(size=(2, 1) + output_shape).astype(np.float32)
    losses = compute_loss(
        tf.constant(prediction),
        {"content": tf.constant(gt_content), "style": tf.constant(gt_style)},
    )
    io = {
        "prediction": prediction,
        "gt_content": gt_content,
        "gt_style": gt_style,
        "factors": np.asarray(
            [
                extractor.content_loss_factor,
                extractor.style_loss_factor,
                extractor.total_variation_loss_factor,
                extractor.depth_loss_factor,
            ],
            dtype=np.float64,
        ),
    }
    for key, value in losses.items():
        io[f"loss/{key}"] = np.asarray(value, dtype=np.float32)
    _save(Path(args.out), weights, io)


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("transfer")
    p.add_argument("--out", required=True)
    p.add_argument("--height", type=int, default=64)
    p.add_argument("--width", type=int, default=128)
    p.add_argument("--channels", type=int, default=17)
    p.add_argument("--bottleneck-y", type=int, default=16)
    p.add_argument("--filters", type=int, default=8)
    p.add_argument("--num-styles", type=int, default=1)
    p.add_argument("--seed", type=int, default=7)
    p.set_defaults(func=cmd_transfer)

    p = sub.add_parser("efficientnet_b3")
    p.add_argument("--out", required=True)
    p.add_argument("--height", type=int, default=96)
    p.add_argument("--width", type=int, default=192)
    p.add_argument("--seed", type=int, default=7)
    p.set_defaults(func=cmd_efficientnet_b3)

    p = sub.add_parser("predictor")
    p.add_argument("--out", required=True)
    p.add_argument("--extractor",
                   choices=("dummy", "mobilenet", "efficientnet"),
                   default="dummy")
    p.add_argument("--height", type=int, default=96)
    p.add_argument("--width", type=int, default=96)
    p.add_argument("--num-top", type=int, default=182)
    p.add_argument("--seed", type=int, default=7)
    p.set_defaults(func=cmd_predictor)

    p = sub.add_parser("vgg16")
    p.add_argument("--out", required=True)
    p.add_argument("--height", type=int, default=64)
    p.add_argument("--width", type=int, default=64)
    p.add_argument("--seed", type=int, default=7)
    p.set_defaults(func=cmd_vgg16)

    p = sub.add_parser("loss")
    p.add_argument("--out", required=True)
    p.add_argument("--extractor", choices=("dummy", "vgg"), default="dummy")
    p.add_argument("--height", type=int, default=64)
    p.add_argument("--width", type=int, default=64)
    p.add_argument("--seed", type=int, default=7)
    p.set_defaults(func=cmd_loss)

    args = parser.parse_args()
    args.func(args)


if __name__ == "__main__":
    main()
