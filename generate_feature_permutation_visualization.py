#!/usr/bin/env python
"""Qualitative channel-swap grid: stylize with one channel taken from another frame.

Parity with the reference's ``generateFeaturePermutationVisualization.py``: for each
G-buffer channel group, replace it with the corresponding channels of a second
sample, stylize, and save the result — a visual read on which inputs matter.

    python generate_feature_permutation_visualization.py -C logs/<run> \
        --network_spec rst-960-120-128-17 --content_dir data/.../validation \
        -s style.jpg -o out/permutation_viz
"""

from __future__ import annotations

import argparse
import logging
from pathlib import Path

import numpy as np

from realtime_style_transfer_tpu import cli
from realtime_style_transfer_tpu.tracing import logsetup

log = logging.getLogger("permutation_viz")


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    cli.add_config_args(p)
    p.add_argument("-C", "--checkpoint_path", type=Path, required=True)
    p.add_argument("--content_dir", type=Path, required=True,
                   help="needs at least two content samples")
    p.add_argument("-s", "--style", type=Path, required=True)
    p.add_argument("-o", "--output", type=Path, default=Path("out/permutation_viz"))
    return p.parse_args()


def main():
    args = parse_args()
    logsetup.setup()

    import jax
    import jax.numpy as jnp

    from compute_permutation_feature_importance import channel_slices
    from realtime_style_transfer_tpu.data.hdr_screenshots import (
        find_screenshots, iter_hdr_screenshots,
    )
    from realtime_style_transfer_tpu.data.imaging import list_image_paths, load_image

    config = cli.config_from_args(args, num_styles=1)
    model, variables = cli.build_inference(config, dtype=cli.compute_dtype(args))
    variables = cli.load_variables(args.checkpoint_path, variables)

    if config.hdr and config.total_channels > 3:
        pngs = find_screenshots(args.content_dir)
        frames = list(iter_hdr_screenshots(pngs[:2], config.channels,
                                           config.content_shape))
    else:
        paths = list_image_paths(args.content_dir)[:2]
        frames = [load_image(p, config.content_shape) for p in paths]
    if len(frames) < 2:
        raise SystemExit("need at least two content samples in --content_dir")
    base, donor = np.asarray(frames[0]), np.asarray(frames[1])

    style = cli.load_styles([args.style], config)[None]
    style_params = jax.jit(
        lambda v, s: model.apply(v, s, method=model.predict_style_params)
    )(variables, jnp.asarray(style))
    stylize = jax.jit(lambda v, c, p: model.apply(v, c, p, method=model.stylize))

    args.output.mkdir(parents=True, exist_ok=True)
    out0 = np.asarray(stylize(variables, jnp.asarray(base[None]), style_params))[0]
    cli.save_image(out0, args.output / "unperturbed.png")
    for name, c0, c1 in channel_slices(config):
        swapped = base.copy()
        swapped[..., c0:c1] = donor[..., c0:c1]
        out = np.asarray(
            stylize(variables, jnp.asarray(swapped[None]), style_params)
        )[0]
        cli.save_image(out, args.output / f"swap_{name}.png")
    log.info("grid images in %s", args.output)


if __name__ == "__main__":
    main()
