#!/usr/bin/env python
"""Export a checkpoint as deployable artifacts.

Parity with the reference's ``save_using_checkpoint.py`` (SavedModel + ONNX + copied
checkpoint), re-targeted to the TPU/JAX toolchain:

* ``<out>/inference.stablehlo``  — serialized jax.export artifact, weights baked in
  (the SavedModel analog; runs anywhere via predict_using_saved_models.py)
* ``<out>/predictor.stablehlo``  — style image -> flat style-param vector
* ``<out>/transfer.stablehlo``   — content + style params -> stylized image
* ``<out>/predictor.onnx`` + ``<out>/transfer.onnx`` — first-party ONNX emission
  (``export/onnx.py``; reference ``save_using_checkpoint.py:90-103`` via tf2onnx)
* ``<out>/checkpoint/``          — copy of the orbax weights artifact
* ``<out>/config.json``          — the ShapeConfig used

    python save_using_checkpoint.py -C logs/<run> --network_spec rst-960-120-128-17 \
        -o out/export
"""

from __future__ import annotations

import argparse
import logging
import shutil
from pathlib import Path

from realtime_style_transfer_tpu import cli
from realtime_style_transfer_tpu.tracing import logsetup

log = logging.getLogger("export")


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    cli.add_config_args(p)
    p.add_argument("-C", "--checkpoint_path", type=Path, required=True)
    p.add_argument("-o", "--output", type=Path, default=Path("out/export"))
    return p.parse_args()


def main():
    args = parse_args()
    logsetup.setup()

    import jax
    import jax.numpy as jnp
    from jax import export as jax_export

    from realtime_style_transfer_tpu.models.inference import plan_from_config

    config = cli.config_from_args(args)
    model, variables = cli.build_inference(config, dtype=cli.compute_dtype(args))
    variables = cli.load_variables(args.checkpoint_path, variables)
    plan = plan_from_config(config)

    out = args.output
    out.mkdir(parents=True, exist_ok=True)
    (out / "config.json").write_text(config.to_json())

    content = jnp.zeros((1,) + config.content_shape, jnp.float32)
    style = jnp.zeros((1,) + config.style_shape, jnp.float32)
    style_params = jnp.zeros((1, config.num_styles, plan.num_style_parameters),
                             jnp.float32)

    def export_fn(name, fn, *example_args):
        exported = jax_export.export(jax.jit(fn))(*example_args)
        path = out / f"{name}.stablehlo"
        path.write_bytes(exported.serialize())
        log.info("exported %s (%d bytes)", path, path.stat().st_size)

    # Weights are closed over -> baked into the artifacts as constants.
    export_fn(
        "inference",
        lambda c, s: model.apply(variables, c, s, train=False),
        content, style,
    )
    export_fn(
        "predictor",
        lambda s: model.apply(variables, s, method=model.predict_style_params),
        style,
    )
    export_fn(
        "transfer",
        lambda c, p: model.apply(variables, c, p, method=model.stylize),
        content, style_params,
    )

    # ONNX for the engine runtime (reference exports predictor + transfer,
    # save_using_checkpoint.py:90-103).  Single-style graphs; multi-style
    # deploys use the StableHLO artifacts.
    from realtime_style_transfer_tpu.export import (
        export_predictor_onnx, export_transfer_onnx,
    )

    if config.num_styles == 1:
        transfer_bytes = export_transfer_onnx(variables, plan)
        (out / "transfer.onnx").write_bytes(transfer_bytes)
        log.info("exported %s (%d bytes)", out / "transfer.onnx",
                 len(transfer_bytes))
        try:
            predictor_bytes = export_predictor_onnx(
                variables, style_shape=config.output_shape,
                num_top_parameters=plan.num_style_parameters,
                feature_extractor=config.feature_extractor,
            )
            (out / "predictor.onnx").write_bytes(predictor_bytes)
            log.info("exported %s (%d bytes)", out / "predictor.onnx",
                     len(predictor_bytes))
        except ValueError as e:
            log.warning("predictor ONNX export skipped: %s", e)
    else:
        log.warning("ONNX export is single-style; use the StableHLO artifacts "
                    "for multi-style deploys")

    # Copy the weights checkpoint (reference copies ckpt files to .checkpoint/).
    src = Path(args.checkpoint_path)
    weights_src = src / "weights" if (src / "weights").exists() else src
    ckpt_dst = out / "checkpoint"
    if ckpt_dst.exists():
        shutil.rmtree(ckpt_dst)
    shutil.copytree(weights_src, ckpt_dst)
    log.info("artifacts in %s", out)


if __name__ == "__main__":
    main()
