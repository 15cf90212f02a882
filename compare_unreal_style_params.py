#!/usr/bin/env python
"""Diff Unreal-computed style params against the Python predictor's output.

Parity with the reference's ``compare_unreal_style_params.py`` (engine parity tool):
reads a raw float32 buffer dumped by the Unreal plugin, recomputes the params with
this framework's predictor, prints a stats table of both and their difference.

    python compare_unreal_style_params.py -C logs/<run> -s style.jpg \
        -b unreal_style_params.bin
"""

from __future__ import annotations

import argparse
import logging
from pathlib import Path

import numpy as np

from realtime_style_transfer_tpu import cli
from realtime_style_transfer_tpu.tracing import logsetup

log = logging.getLogger("compare_style_params")


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    cli.add_config_args(p)
    p.add_argument("-C", "--checkpoint_path", type=Path, required=True)
    p.add_argument("-s", "--style", type=Path, required=True)
    p.add_argument("-b", "--buffer", type=Path, required=True,
                   help="raw float32 style-param buffer from the engine")
    return p.parse_args()


def main():
    args = parse_args()
    logsetup.setup()

    import jax
    import jax.numpy as jnp

    from realtime_style_transfer_tpu.data.native import (
        get_lib, read_tensor_buffer,
    )
    from realtime_style_transfer_tpu.models.inference import plan_from_config
    from realtime_style_transfer_tpu.utils import comparison_table

    config = cli.config_from_args(args, num_styles=1)
    plan = plan_from_config(config)
    n = get_lib().tensorbuffer_num_elements(str(args.buffer).encode())
    if n != plan.num_style_parameters:
        log.warning(
            "buffer has %d floats but config %s expects %d — check --network_spec",
            n, config.to_spec(), plan.num_style_parameters,
        )
    unreal = read_tensor_buffer(args.buffer, (n,))

    model, variables = cli.build_inference(config, dtype=cli.compute_dtype(args))
    variables = cli.load_variables(args.checkpoint_path, variables)
    style = cli.load_styles([args.style], config)[None]
    ours = np.asarray(
        jax.jit(lambda v, s: model.apply(v, s, method=model.predict_style_params))(
            variables, jnp.asarray(style)
        )
    )[0, 0]

    print(comparison_table({"unreal": unreal, "python": ours[: unreal.size]}))


if __name__ == "__main__":
    main()
