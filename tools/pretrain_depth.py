#!/usr/bin/env python
"""Pretrain MidasLite on the dataset's SceneDepth G-buffer (depth-loss weights).

The reference's depth loss uses TF-Hub MiDaS v2
(``/root/reference/realtime_style_transfer/models/styleLoss.py:250-287``); this
image cannot bundle that binary, so the depth net trains on the corpus's own
ground truth instead::

    python tools/pretrain_depth.py \
        --content_dir data/screenshots --output out/depth_ckpt \
        --epochs 20 --batch_size 4

then enable the depth term with ``train_network.py --depth_loss
--depth_checkpoint out/depth_ckpt``.  Validate visually with
``depth_analysis.py --depth_weights out/depth_ckpt``.

``--synthetic N`` needs no data at all: it pretrains on N procedurally
rasterized scenes with ANALYTIC ground-truth depth (random spheres/boxes
over a receding ground plane with distance fog — see
``depth_pretrain.generate_procedural_scene``).  The committed
``realtime_style_transfer_tpu/assets/midas_lite_synthetic.npz`` was produced
this way::

    python tools/pretrain_depth.py --synthetic 240 --resolution 192 \
        --base_filters 16 --epochs 12 --batch_size 8 \
        --output realtime_style_transfer_tpu/assets/midas_lite_synthetic.npz

A ``.npz`` --output saves a single committable file instead of an Orbax dir.
"""

from __future__ import annotations

import argparse
from pathlib import Path
import sys

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from realtime_style_transfer_tpu.depth_pretrain import (  # noqa: E402
    evaluate_depth_checkpoint,
    pretrain,
    pretrain_on_pairs,
    save_depth_checkpoint,
    synthetic_depth_pairs,
)
from realtime_style_transfer_tpu.tracing import logsetup  # noqa: E402


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--content_dir", type=Path, default=None,
                   help="dir with training/ and validation/ screenshot subdirs "
                        "(X.png + X_SceneDepth.exr siblings)")
    p.add_argument("--synthetic", type=int, default=None, metavar="N",
                   help="pretrain on N procedural scenes with analytic depth "
                        "instead of --content_dir (90/10 train/val split)")
    p.add_argument("--output", type=Path, required=True,
                   help="orbax checkpoint dir for the trained MidasLite")
    p.add_argument("--resolution", type=int, default=384)
    p.add_argument("--base_filters", type=int, default=32)
    p.add_argument("--epochs", type=int, default=20)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--learning_rate", type=float, default=1e-3)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--min_spearman", type=float, default=None,
                   help="quality gate: refuse to save unless the trained "
                        "net's mean Spearman rank correlation against the "
                        "validation SceneDepth targets clears this bar "
                        "(the committed checkpoint scores ~0.89 held-out)")
    args = p.parse_args()
    logsetup.setup()

    import os

    if os.environ.get("RST_PLATFORM"):
        import jax

        jax.config.update("jax_platforms", os.environ["RST_PLATFORM"])

    common = dict(
        resolution=args.resolution, base_filters=args.base_filters,
        epochs=args.epochs, batch_size=args.batch_size,
        learning_rate=args.learning_rate, seed=args.seed,
    )
    if (args.synthetic is None) == (args.content_dir is None):
        raise SystemExit("pass exactly one of --content_dir / --synthetic")
    if args.synthetic is not None:
        pairs = synthetic_depth_pairs(
            args.synthetic, args.resolution, seed=args.seed)
        n_val = max(1, len(pairs) // 10)
        val_pairs = pairs[:n_val]
        variables, history = pretrain_on_pairs(
            pairs[n_val:], val_pairs, **common)
    else:
        from realtime_style_transfer_tpu.data.imaging import list_image_paths
        from realtime_style_transfer_tpu.depth_pretrain import load_depth_pairs

        train_paths = list_image_paths(args.content_dir / "training")
        val_paths = list_image_paths(args.content_dir / "validation")
        variables, history = pretrain(train_paths, val_paths, **common)
        val_pairs = list(load_depth_pairs(val_paths, args.resolution))

    scores = evaluate_depth_checkpoint(variables, val_pairs)
    print(
        f"quality vs validation SceneDepth: spearman {scores['spearman']:.4f}"
        f", pearson {scores['pearson']:.4f}, aligned_rmse "
        f"{scores['aligned_rmse']:.4f} over {scores['n']} scenes"
    )
    if args.min_spearman is not None and scores["spearman"] < args.min_spearman:
        raise SystemExit(
            f"quality gate failed: spearman {scores['spearman']:.4f} < "
            f"--min_spearman {args.min_spearman}; not saving {args.output}")
    save_depth_checkpoint(variables, args.output)
    print(
        f"saved {args.output}; val correlation "
        f"{history['initial_val_correlation']:.4f} -> "
        f"{history['val_correlation'][-1]:.4f}"
    )


if __name__ == "__main__":
    main()
