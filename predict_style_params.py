#!/usr/bin/env python
"""Predict style params for a style image and dump them as a raw float32 buffer.

Parity with the reference's ``predict_style_params.py`` (engine-interop path: the
Unreal plugin consumes these buffers; stats are printed for eyeballing).

    python predict_style_params.py -C logs/<run> -s style.jpg -o style_params.bin
"""

from __future__ import annotations

import argparse
import logging
from pathlib import Path

import numpy as np

from realtime_style_transfer_tpu import cli
from realtime_style_transfer_tpu.tracing import logsetup

log = logging.getLogger("predict_style_params")


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    cli.add_config_args(p)
    p.add_argument("-C", "--checkpoint_path", type=Path, required=True)
    p.add_argument("-s", "--style", type=Path, required=True)
    p.add_argument("-o", "--output", type=Path, default=Path("out/style_params.bin"))
    return p.parse_args()


def main():
    args = parse_args()
    logsetup.setup()

    import jax
    import jax.numpy as jnp

    from realtime_style_transfer_tpu.data.native import write_tensor_buffer
    from realtime_style_transfer_tpu.utils import comparison_table

    config = cli.config_from_args(args, num_styles=1)
    model, variables = cli.build_inference(config, dtype=cli.compute_dtype(args))
    variables = cli.load_variables(args.checkpoint_path, variables)

    style = cli.load_styles([args.style], config)[None]
    params = jax.jit(
        lambda v, s: model.apply(v, s, method=model.predict_style_params)
    )(variables, jnp.asarray(style))
    params = np.asarray(params)[0, 0]  # (P,)

    args.output.parent.mkdir(parents=True, exist_ok=True)
    write_tensor_buffer(args.output, params)
    log.info("wrote %d style params to %s", params.size, args.output)
    print(comparison_table({"style_params": params}))


if __name__ == "__main__":
    main()
