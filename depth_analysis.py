#!/usr/bin/env python
"""Visual check of the depth network against the SceneDepth G-buffer channel.

Parity with the reference's ``test_depth_analysis.py`` (a manual/visual tool, not a
unit test — renamed here so pytest doesn't collect it): runs the depth model on the
FinalImage RGB, loads the SceneDepth EXR, and writes both side by side.

    python depth_analysis.py --screenshot shot.png \
        [--depth_weights <ckpt>] -o out/depth_analysis
"""

from __future__ import annotations

import argparse
import logging
from pathlib import Path

import numpy as np

from realtime_style_transfer_tpu import cli
from realtime_style_transfer_tpu.tracing import logsetup

log = logging.getLogger("depth_analysis")


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--screenshot", type=Path, required=True,
                   help="PNG with a sibling _SceneDepth.exr")
    p.add_argument("--depth_weights", type=Path, default=None,
                   help="optional MidasLite checkpoint (orbax dir or .npz; "
                        "'bundled' = the committed synthetic-pretrained one)")
    p.add_argument("-o", "--output", type=Path, default=Path("out/depth_analysis"))
    return p.parse_args()


def normalize01(x: np.ndarray) -> np.ndarray:
    lo, hi = np.percentile(x, 2), np.percentile(x, 98)
    return np.clip((x - lo) / max(hi - lo, 1e-8), 0.0, 1.0)


def main():
    args = parse_args()
    logsetup.setup()

    import jax
    import jax.numpy as jnp

    from realtime_style_transfer_tpu.data.imaging import load_image
    from realtime_style_transfer_tpu.data.native import read_exr
    from realtime_style_transfer_tpu.models.depth import (
        DEPTH_RESOLUTION, MidasLite, resize_for_depth,
    )

    rgb = load_image(args.screenshot, (DEPTH_RESOLUTION, DEPTH_RESOLUTION, 3))
    if args.depth_weights is not None:
        from realtime_style_transfer_tpu.depth_pretrain import (
            BUNDLED_DEPTH_CHECKPOINT, depth_base_filters, load_depth_checkpoint,
        )

        ckpt = args.depth_weights
        if str(ckpt) == "bundled":
            ckpt = BUNDLED_DEPTH_CHECKPOINT
        variables = load_depth_checkpoint(ckpt)
        model = MidasLite(base_filters=depth_base_filters(variables))
    else:
        log.warning("no --depth_weights given: using random-init MidasLite "
                    "(structure check only)")
        model = MidasLite()
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), rgb[None])
    predicted = np.asarray(
        jax.jit(model.apply)(variables, jnp.asarray(rgb[None]))
    )[0]

    depth_path = (args.screenshot.parent
                  / f"{args.screenshot.stem}_SceneDepth.exr")
    scene_depth = read_exr(depth_path)["R"]

    args.output.mkdir(parents=True, exist_ok=True)
    cli.save_image(rgb, args.output / "rgb.png")
    cli.save_image(normalize01(predicted)[..., None],
                   args.output / "predicted_depth.png")
    cli.save_image(normalize01(scene_depth)[..., None],
                   args.output / "scene_depth.png")

    from realtime_style_transfer_tpu.utils import comparison_table

    print(comparison_table({
        "predicted": normalize01(predicted),
        "scene_depth_norm": normalize01(
            np.asarray(
                jax.image.resize(jnp.asarray(scene_depth),
                                 predicted.shape, "bilinear")
            )
        ),
    }))
    log.info("images in %s", args.output)


if __name__ == "__main__":
    main()
