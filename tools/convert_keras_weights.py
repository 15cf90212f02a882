#!/usr/bin/env python
"""Convert pretrained Keras backbone weights into this framework's param pytrees.

This zero-egress image bundles no ImageNet weights; run step 1 wherever TF exists,
then step 2 here.

Step 1 (machine with tensorflow): dump a backbone to npz ::

    import numpy as np, tensorflow as tf
    m = tf.keras.applications.VGG16(include_top=False, weights="imagenet")
    np.savez("vgg16_imagenet.npz",
             **{w.name: w.numpy() for layer in m.layers for w in layer.weights})

Step 2 (here): ::

    python tools/convert_keras_weights.py vgg16 vgg16_imagenet.npz out/vgg16_params

The output is an Orbax checkpoint of the flax params for
``models.backbones.vgg.VGG16Features`` (caffe preprocessing is applied by the loss
module, not baked into weights).  MobileNetV3-Small conversion: same flow with the
``mobilenetv3`` converter (kernel layouts are identical HWIO; BN moving stats map to
flax ``batch_stats``).
"""

from __future__ import annotations

import argparse
import re
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def convert_vgg16(npz) -> dict:
    """Keras VGG16 names (block{i}_conv{j}/kernel:0) -> VGG16Features params."""
    params = {}
    for key in npz.files:
        m = re.match(r".*?(block\d_conv\d)/(kernel|bias)", key)
        if not m:
            continue
        layer, kind = m.groups()
        entry = params.setdefault(layer, {})
        entry["kernel" if kind == "kernel" else "bias"] = np.asarray(npz[key])
    missing = {f"block{b}_conv{c}" for b, n in enumerate((2, 2, 3, 3, 3), 1)
               for c in range(1, n + 1)} - set(params)
    if missing:
        raise SystemExit(f"npz is missing layers: {sorted(missing)}")
    return {"params": params}


def convert_mobilenetv3(npz) -> dict:
    """Keras MobileNetV3Small dump -> MobileNetV3Small module variables.

    Keras layer-name patterns (from tf.keras.applications.MobileNetV3Small):
      Conv/kernel, Conv/BatchNorm/{gamma,beta,moving_mean,moving_variance}
      expanded_conv[_i]/{expand,depthwise,project}/(kernel|depthwise_kernel)
      expanded_conv[_i]/{expand,depthwise,project}/BatchNorm/...
      expanded_conv[_i]/squeeze_excite/Conv[_1]/{kernel,bias}
      Conv_1/kernel + Conv_1/BatchNorm/...
    """
    params: dict = {}
    batch_stats: dict = {}

    def put(tree, path, value):
        node = tree
        for part in path[:-1]:
            node = node.setdefault(part, {})
        node[path[-1]] = np.asarray(value)

    def bn(dst_module, dst_name, src_prefix):
        put(params, (*dst_module, dst_name, "scale"), npz[f"{src_prefix}/gamma:0"])
        put(params, (*dst_module, dst_name, "bias"), npz[f"{src_prefix}/beta:0"])
        put(batch_stats, (*dst_module, dst_name, "mean"),
            npz[f"{src_prefix}/moving_mean:0"])
        put(batch_stats, (*dst_module, dst_name, "var"),
            npz[f"{src_prefix}/moving_variance:0"])

    # stem + final conv
    put(params, ("stem_conv", "kernel"), npz["Conv/kernel:0"])
    bn((), "stem_bn", "Conv/BatchNorm")
    put(params, ("last_conv", "kernel"), npz["Conv_1/kernel:0"])
    bn((), "last_bn", "Conv_1/BatchNorm")

    from realtime_style_transfer_tpu.models.backbones.mobilenetv3 import (
        MOBILENETV3_SMALL_BLOCKS,
    )

    for i, (_k, _exp, _out, use_se, _act, _s) in enumerate(MOBILENETV3_SMALL_BLOCKS):
        src = "expanded_conv" if i == 0 else f"expanded_conv_{i}"
        dst = src
        if i > 0:
            put(params, (dst, "expand", "kernel"), npz[f"{src}/expand/kernel:0"])
            bn((dst,), "expand_bn", f"{src}/expand/BatchNorm")
        dw = npz[f"{src}/depthwise/depthwise_kernel:0"]
        # Keras depthwise kernel (H, W, C, 1) -> lax grouped-conv HWIO (H, W, 1, C)
        put(params, (dst, "depthwise", "kernel"), np.transpose(dw, (0, 1, 3, 2)))
        bn((dst,), "depthwise_bn", f"{src}/depthwise/BatchNorm")
        if use_se:
            put(params, (dst, "se", "se_reduce", "kernel"),
                npz[f"{src}/squeeze_excite/Conv/kernel:0"])
            put(params, (dst, "se", "se_reduce", "bias"),
                npz[f"{src}/squeeze_excite/Conv/bias:0"])
            put(params, (dst, "se", "se_expand", "kernel"),
                npz[f"{src}/squeeze_excite/Conv_1/kernel:0"])
            put(params, (dst, "se", "se_expand", "bias"),
                npz[f"{src}/squeeze_excite/Conv_1/bias:0"])
        put(params, (dst, "project", "kernel"), npz[f"{src}/project/kernel:0"])
        bn((dst,), "project_bn", f"{src}/project/BatchNorm")

    return {"params": params, "batch_stats": batch_stats}


CONVERTERS = {"vgg16": convert_vgg16, "mobilenetv3": convert_mobilenetv3}


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("backbone", choices=sorted(CONVERTERS))
    p.add_argument("npz_path", type=Path)
    p.add_argument("output", type=Path, help="orbax checkpoint dir to write")
    args = p.parse_args()

    npz = np.load(args.npz_path)
    variables = CONVERTERS[args.backbone](npz)

    import orbax.checkpoint as ocp

    checkpointer = ocp.StandardCheckpointer()
    checkpointer.save(args.output.resolve(), variables, force=True)
    checkpointer.wait_until_finished()
    n = sum(int(np.prod(v.shape)) for v in npz.values())
    print(f"converted {args.backbone}: {n:,} source values -> {args.output}")


if __name__ == "__main__":
    main()
