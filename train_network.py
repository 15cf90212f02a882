#!/usr/bin/env python
"""Train the style-transfer network (reference ``train_network.py`` parity, with
flags instead of edit-the-source configuration).

Examples:
    python train_network.py --debug --loss dummy --epochs 2 \
        --network_spec rst-120-15-4-3 --sdr
    python train_network.py --network_spec rst-960-120-128-17 \
        --content_dir data/screenshots/hdr_images --epochs 300 --batch_size 4
"""

from __future__ import annotations

import argparse
import logging
from pathlib import Path

from realtime_style_transfer_tpu import cli
from realtime_style_transfer_tpu.models.losses import LOSS_EXTRACTORS
from realtime_style_transfer_tpu.tracing import logsetup

log = logging.getLogger("train_network")


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    cli.add_config_args(p)
    p.add_argument("--epochs", type=int, default=300)  # reference regime
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--learning_rate", type=float, default=1e-3)
    p.add_argument("--loss", choices=sorted(LOSS_EXTRACTORS), default="vgg")
    p.add_argument(
        "--loss_tower", choices=("split", "batched", "scan"), default="split",
        help="schedule of the three loss-extractor invocations (identical "
             "values/gradients; perf differs by hardware — see "
             "tools/bench_train_step.py)",
    )
    p.add_argument("--no_depth_loss", action="store_true")
    p.add_argument(
        "--depth_loss", action="store_true",
        help="enable the depth-aware loss term (supply --depth_checkpoint)",
    )
    p.add_argument(
        "--depth_checkpoint", type=Path, default=None,
        help="pretrained MidasLite checkpoint (tools/pretrain_depth.py; "
             "orbax dir or .npz); implies --depth_loss.  Pass 'bundled' for "
             "the committed synthetic-pretrained weights "
             "(realtime_style_transfer_tpu/assets/midas_lite_synthetic.npz)",
    )
    p.add_argument(
        "--remat", action="store_true",
        help="rematerialize the forward under grad (less HBM, ~1 extra forward)",
    )
    p.add_argument("--log_dir", type=Path, default=None)
    p.add_argument(
        "--continue_from", type=Path, default=None,
        help="previous run dir to resume from (restores latest checkpoint)",
    )
    p.add_argument("--content_dir", type=Path, default=None)
    p.add_argument(
        "--style_dir", type=Path, default=None,
        help="local style-image directory (bypasses the wikiart manifest)",
    )
    p.add_argument("--cache_dir", type=Path, default=None)
    p.add_argument("--checkpoint_cadence", type=int, default=10)
    p.add_argument("--seed", type=int, default=36)
    p.add_argument("--debug", action="store_true", help="100-image debug dataset")
    p.add_argument(
        "--mesh", type=str, default=None,
        help="device mesh as data[,spatial], e.g. '4,2'; default single device",
    )
    p.add_argument("--profile", action="store_true", help="jax.profiler trace")
    p.add_argument(
        "--debug_nans", action="store_true",
        help="jax debug_nans mode (the reference's enable_check_numerics role)",
    )
    p.add_argument(
        "--disable_jit", action="store_true",
        help="eager execution for debugging (the reference's run_eagerly role)",
    )
    return p.parse_args()


def main():
    args = parse_args()
    logsetup.setup()
    log_dir = args.log_dir or cli.default_log_dir()
    log_dir.mkdir(parents=True, exist_ok=True)
    logsetup.enable_logfile(log_dir)

    import jax

    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)
    if args.disable_jit:
        jax.config.update("jax_disable_jit", True)

    from realtime_style_transfer_tpu.data import wikiart
    from realtime_style_transfer_tpu.data.pipeline import get_single_sample
    from realtime_style_transfer_tpu.models.training import (
        make_style_transfer_training_model,
    )
    from realtime_style_transfer_tpu.parallel import make_mesh
    from realtime_style_transfer_tpu.tracing import (
        CheckpointCallback, CheckpointManager, GradientsCallback,
        HistogramCallback, MetricsCallback, MetricsWriter, SummaryImageCallback,
        capture_model_summary,
    )
    from realtime_style_transfer_tpu.trainer import Trainer

    config = cli.config_from_args(args)
    log.info("config: %s", config.to_spec())
    (log_dir / "config.json").write_text(config.to_json())

    import optax

    depth_variables = None
    if args.depth_checkpoint is not None:
        from realtime_style_transfer_tpu.depth_pretrain import (
            BUNDLED_DEPTH_CHECKPOINT, load_depth_checkpoint,
        )

        ckpt = args.depth_checkpoint
        if str(ckpt) == "bundled":
            ckpt = BUNDLED_DEPTH_CHECKPOINT
        depth_variables = load_depth_checkpoint(ckpt)
    with_depth = (
        config.with_depth_loss or args.depth_loss
        or args.depth_checkpoint is not None
    ) and not args.no_depth_loss
    tm = make_style_transfer_training_model(
        config,
        loss_extractor=args.loss,
        tower_mode=args.loss_tower,
        with_depth_loss=with_depth,
        depth_variables=depth_variables,
        dtype=cli.compute_dtype(args),
        remat=args.remat,
        optimizer=optax.rmsprop(args.learning_rate, decay=0.9, eps=1e-7),
    )

    channels = list(config.channels) if config.hdr else None
    style_paths = None
    if args.style_dir is not None:
        from realtime_style_transfer_tpu.data.imaging import list_image_paths

        style_paths = sorted(list_image_paths(args.style_dir))
    dataset_kwargs = dict(
        seed=args.seed, cache_dir=args.cache_dir, channels=channels,
        content_dir=args.content_dir, style_paths=style_paths,
    )
    if args.debug:
        make_train, make_val, n_train, n_val = wikiart.get_dataset_debug(
            config, args.batch_size, hdr=config.hdr,
            **{k: v for k, v in dataset_kwargs.items() if k != "content_dir"},
        )
    else:
        make_train, make_val, n_train, n_val = wikiart.get_dataset(
            config, args.batch_size, **dataset_kwargs
        )
    log.info("dataset: %d training / %d validation samples", n_train, n_val)
    if n_train == 0:
        raise SystemExit(
            "no training samples found — check --content_dir/--style_dir "
            "(expected training/ and validation/ subdirectories)"
        )

    mesh = None
    if args.mesh:
        parts = [int(x) for x in args.mesh.split(",")]
        spatial = parts[1] if len(parts) > 1 else 1
        mesh = make_mesh(parts[0] * spatial, spatial=spatial)
        log.info("mesh: %s", dict(mesh.shape))

    writer = MetricsWriter(log_dir)
    checkpoints = CheckpointManager(log_dir, cadence=args.checkpoint_cadence)
    val_batch = get_single_sample(_first_iter(make_val))
    train_batch = get_single_sample(_first_iter(make_train))

    callbacks = [
        MetricsCallback(writer),
        CheckpointCallback(checkpoints),
        HistogramCallback(writer, every=5),
    ]
    if val_batch is not None and train_batch is not None:
        callbacks.append(
            SummaryImageCallback(log_dir, tm, val_batch, train_batch)
        )
        callbacks.append(GradientsCallback(writer, tm, val_batch, every=5))

    trainer = Trainer(
        tm, mesh=mesh, log_dir=log_dir, callbacks=callbacks, metrics_writer=writer
    )
    state = trainer.init_state(jax.random.PRNGKey(args.seed))
    writer.write_text("model_summary", capture_model_summary(state.params))
    writer.write_text("config", config.to_json())

    initial_epoch = 0
    if args.continue_from:
        prev = CheckpointManager(args.continue_from, cadence=args.checkpoint_cadence)
        state, initial_epoch = trainer.resume(state, prev)
        prev.close()

    from realtime_style_transfer_tpu.tracing.profiler import trace

    with trace(str(log_dir / "profile") if args.profile else None):
        trainer.fit(
            state, make_train, make_val,
            epochs=args.epochs, initial_epoch=initial_epoch,
        )
    checkpoints.close()
    log.info("done; artifacts in %s", log_dir)


def _first_iter(make_iter):
    """Unbatched view of the first element for summary images."""
    def gen():
        for batch in make_iter():
            yield batch
            return
    return _flatten_one(gen())


def _flatten_one(batches):
    import jax

    for batch in batches:
        n = jax.tree.leaves(batch)[0].shape[0]
        for i in range(n):
            yield jax.tree.map(lambda x: x[i], batch)


if __name__ == "__main__":
    main()
