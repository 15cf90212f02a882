#!/usr/bin/env python
"""Stylize an image from exported artifacts — no model-building code path.

Parity with the reference's ``predict_using_saved_models.py`` (the CPU-friendly
"minimum slice": load a deployable artifact, run, save a PNG).  Artifacts are the
serialized StableHLO modules written by ``save_using_checkpoint.py`` with weights
baked in.

    python predict_using_saved_models.py -m out/export -c content.png \
        -s style.jpg -o out/styled.png
"""

from __future__ import annotations

import argparse
import json
import logging
from pathlib import Path

import numpy as np

from realtime_style_transfer_tpu import cli
from realtime_style_transfer_tpu.tracing import logsetup

log = logging.getLogger("predict_saved")


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-m", "--model_dir", type=Path, required=True,
                   help="export dir from save_using_checkpoint.py")
    p.add_argument("-c", "--content", type=Path, required=True)
    p.add_argument("-s", "--style", type=Path, action="append", required=True)
    p.add_argument("-o", "--output", type=Path, default=Path("out/styled.png"))
    return p.parse_args()


def load_exported(model_dir: Path, name: str):
    from jax import export as jax_export

    path = model_dir / f"{name}.stablehlo"
    return jax_export.deserialize(path.read_bytes())


def main():
    args = parse_args()
    logsetup.setup()

    import jax.numpy as jnp

    from realtime_style_transfer_tpu.config import ShapeConfig

    saved_config = json.loads((args.model_dir / "config.json").read_text())
    config = ShapeConfig(**{
        k: v for k, v in saved_config.items() if k != "derived"
    })

    inference = load_exported(args.model_dir, "inference")
    content = cli.load_content(args.content, config)[None]
    styles = cli.load_styles(args.style, config)[None]

    out = inference.call(jnp.asarray(content), jnp.asarray(styles))
    cli.save_image(np.asarray(out)[0], args.output)


if __name__ == "__main__":
    main()
