#!/usr/bin/env python
"""Stylize a single image from a training checkpoint.

Parity with the reference's ``predict_using_checkpoint.py`` (single or dual style
with an optional per-pixel weight map):

    python predict_using_checkpoint.py -C logs/<run> -c content.png \
        -s style_a.jpg [-s style_b.jpg -w weightmap.png] -o out.png
"""

from __future__ import annotations

import argparse
import logging
from pathlib import Path

import numpy as np

from realtime_style_transfer_tpu import cli
from realtime_style_transfer_tpu.tracing import logsetup

log = logging.getLogger("predict")


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    cli.add_config_args(p)
    p.add_argument("-C", "--checkpoint_path", type=Path, required=True,
                   help="run dir or weights dir")
    p.add_argument("-s", "--style", type=Path, action="append", required=True,
                   help="style image (repeat for dual-style blending)")
    p.add_argument("-w", "--style_weights", type=Path, default=None,
                   help="grayscale weight-map image for style 2")
    p.add_argument("-c", "--content", type=Path, required=True,
                   help="content image (PNG; with sibling _<Channel>.exr for HDR)")
    p.add_argument("-o", "--output", type=Path, default=Path("out/prediction.png"))
    p.add_argument("-p", "--save_content_preview", action="store_true",
                   help="also save the preprocessed content RGB")
    return p.parse_args()


def main():
    args = parse_args()
    logsetup.setup()

    import jax.numpy as jnp

    config = cli.config_from_args(args, num_styles=len(args.style))
    model, variables = cli.build_inference(config, dtype=cli.compute_dtype(args))
    variables = cli.load_variables(args.checkpoint_path, variables)

    content = cli.load_content(args.content, config)[None]
    styles = cli.load_styles(args.style, config)[None]  # (1, S, H, W, 3)

    kwargs = {}
    if config.num_styles > 1:
        if args.style_weights is not None:
            from realtime_style_transfer_tpu.data.imaging import load_image

            wm = load_image(
                args.style_weights,
                config.output_dimensions + (config.num_styles - 1,),
            )
        else:
            wm = np.zeros(config.style_weights_shape, np.float32)
        kwargs["style_weights"] = jnp.asarray(wm[None])

    import jax

    predict = jax.jit(
        lambda v, c, s, **kw: model.apply(v, c, s, train=False, **kw)
    )
    prediction = np.asarray(predict(variables, jnp.asarray(content),
                                    jnp.asarray(styles), **kwargs))[0]
    cli.save_image(prediction, args.output)
    if args.save_content_preview:
        cli.save_image(content[0][..., :3],
                       args.output.with_name(args.output.stem + "_content.png"))


if __name__ == "__main__":
    main()
