#!/usr/bin/env python
"""Gradient attribution: mean |d loss / d content| per G-buffer channel group.

Parity with the reference's ``compute_gradient_explanation.py`` — which had
bit-rotted (it passed stale arguments into the model factory and would crash,
reference ``:26-36``); this version is wired to the current factories and tested.

    python compute_gradient_explanation.py -C logs/<run> --network_spec rst-960-120-128-17 \
        --content_dir data/.../validation --style_dir data/wikiart/debug_images/validation
"""

from __future__ import annotations

import argparse
import logging
from pathlib import Path

import numpy as np

from realtime_style_transfer_tpu import cli
from realtime_style_transfer_tpu.models.losses import LOSS_EXTRACTORS
from realtime_style_transfer_tpu.tracing import logsetup

log = logging.getLogger("gradient_explanation")


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    cli.add_config_args(p)
    p.add_argument("-C", "--checkpoint_path", type=Path, required=True)
    p.add_argument("--content_dir", type=Path, required=True)
    p.add_argument("--style_dir", type=Path, required=True)
    p.add_argument("--loss", choices=sorted(LOSS_EXTRACTORS), default="vgg")
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--max_batches", type=int, default=8)
    p.add_argument("-o", "--output", type=Path, default=Path("out/grad_explanation"))
    return p.parse_args()


def main():
    args = parse_args()
    logsetup.setup()

    import jax
    import jax.numpy as jnp

    from compute_permutation_feature_importance import channel_slices
    from realtime_style_transfer_tpu.data import pipeline
    from realtime_style_transfer_tpu.data.hdr_screenshots import (
        find_screenshots, iter_hdr_screenshots,
    )
    from realtime_style_transfer_tpu.data.imaging import list_image_paths, load_image
    from realtime_style_transfer_tpu.models.training import (
        make_style_transfer_training_model, TrainState,
    )

    config = cli.config_from_args(args, num_styles=1)
    tm = make_style_transfer_training_model(
        config, loss_extractor=args.loss, with_depth_loss=False,
        dtype=cli.compute_dtype(args),
    )
    state = tm.init_state(jax.random.PRNGKey(0))
    variables = cli.load_variables(
        args.checkpoint_path,
        {"params": state.params, "batch_stats": state.batch_stats},
    )
    state = TrainState(
        step=state.step, params=variables["params"],
        batch_stats=variables["batch_stats"], opt_state=state.opt_state,
    )

    @jax.jit
    def content_grads(state, batch):
        inputs, gt = batch

        def loss_of_content(content):
            _, (losses, _) = tm.loss_and_metrics(
                state.params, state.batch_stats,
                ({**inputs, "content": content}, gt), train=False,
            )
            return jnp.mean(losses["loss"])

        grad = jax.grad(loss_of_content)(inputs["content"])
        return jnp.mean(jnp.abs(grad), axis=(0, 1, 2))  # (C,)

    def batches():
        styles = (load_image(p, config.output_shape)
                  for p in list_image_paths(args.style_dir))
        if config.hdr and config.total_channels > 3:
            pngs = find_screenshots(args.content_dir)
            content = iter_hdr_screenshots(
                pngs, config.channels, config.content_shape,
                output_shape=config.output_shape,
            )
        else:
            content = (
                (load_image(p, config.content_shape),
                 load_image(p, config.output_shape))
                for p in list_image_paths(args.content_dir)
            )
        paired = pipeline.pair_content_and_style(content, styles)
        yield from pipeline.batched(paired, args.batch_size)

    per_channel = []
    for bi, batch in enumerate(batches()):
        if bi >= args.max_batches:
            break
        per_channel.append(np.asarray(content_grads(state, jax.tree.map(jnp.asarray, batch))))
        log.info("batch %d done", bi)
    if not per_channel:
        raise SystemExit("no batches produced — check --content_dir/--style_dir")
    mean_abs = np.mean(per_channel, axis=0)

    import pandas as pd

    rows = []
    for name, c0, c1 in channel_slices(config):
        rows.append({"channel": name,
                     "mean_abs_gradient": float(mean_abs[c0:c1].mean())})
    df = pd.DataFrame(rows).sort_values("mean_abs_gradient", ascending=False)
    print(df.to_string(index=False))
    args.output.mkdir(parents=True, exist_ok=True)
    (args.output / "gradient_attribution.csv").write_text(df.to_csv(index=False))


if __name__ == "__main__":
    main()
