#!/usr/bin/env python
"""Export a checkpoint as deployable artifacts.

Parity with the reference's ``save_using_checkpoint.py`` (SavedModel + ONNX + copied
checkpoint), re-targeted to the TPU/JAX toolchain:

* ``<out>/inference.stablehlo``  — serialized jax.export artifact, weights baked in
  (the SavedModel analog; runs anywhere via predict_using_saved_models.py)
* ``<out>/predictor.stablehlo``  — style image -> flat style-param vector
* ``<out>/transfer.stablehlo``   — content + style params -> stylized image
* ``<out>/checkpoint/``          — copy of the orbax weights artifact
* ``<out>/config.json``          — the ShapeConfig used
* ONNX export is emitted only when an onnx exporter is importable (this image has
  none); a clear warning is logged otherwise.

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

    # ONNX: gated — no exporter in this environment.
    try:
        import onnx  # noqa: F401

        log.warning("onnx is importable but no jax->onnx exporter is bundled; "
                    "skipping ONNX emit")
    except ImportError:
        log.warning("ONNX export skipped (no onnx package in this environment); "
                    "StableHLO artifacts above are the portable format")

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
