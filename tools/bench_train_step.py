#!/usr/bin/env python
"""Train-step wall time on the real TPU: batched (3B) vs split loss tower.

Methodology: same as bench.py — the tunnel's block_until_ready doesn't block,
so K train steps are chained in one jitted lax.scan (the TrainState carry is
the data dependency) and the per-step time is the slope between two K values.

Usage: timeout 570 python tools/bench_train_step.py [--tower split|batched|scan]
       [--spec rst-960-120-128-17]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    str(Path(__file__).resolve().parent.parent / ".jax_cache"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

if os.environ.get("RST_PLATFORM"):
    # CPU smoke runs with tiny specs (the sitecustomize pins JAX_PLATFORMS=axon
    # machine-wide; only an in-process config update overrides it)
    jax.config.update("jax_platforms", os.environ["RST_PLATFORM"])


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--spec", default="rst-960-120-128-17")
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--tower", choices=("split", "batched", "scan"),
                   default="split",
                   help="loss-tower mode (see losses.make_style_loss_function)")
    p.add_argument("--remat", action="store_true",
                   help="jax.checkpoint the transfer forward under grad")
    p.add_argument("--k", type=int, nargs=2, default=(2, 6))
    p.add_argument("--trials", type=int, default=3)
    p.add_argument("--trace", default=None, metavar="DIR",
                   help="capture a jax.profiler trace of one warm K-step "
                        "call into DIR (TensorBoard-viewable)")
    args = p.parse_args()

    from realtime_style_transfer_tpu.config import ShapeConfig
    from realtime_style_transfer_tpu.models.training import (
        make_style_transfer_training_model,
    )

    config = ShapeConfig.from_spec(args.spec)
    # tower_mode goes through the production constructor (an earlier version
    # only rebound compute_loss under --split, so both arms of the r3
    # "batched vs split" measurement actually ran split — the 216.9 vs 190.2
    # delta was tunnel noise, not a real schedule difference)
    tm = make_style_transfer_training_model(
        config, loss_extractor="vgg", with_depth_loss=False,
        dtype=jnp.bfloat16, remat=args.remat, tower_mode=args.tower,
    )

    state = tm.init_state(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    b = args.batch
    inputs = {
        "content": jnp.asarray(
            rng.random((b,) + config.content_shape), jnp.float32),
        "style": jnp.asarray(
            rng.random((b,) + config.style_shape), jnp.float32),
    }
    ground_truth = {
        "content": inputs["content"][..., :3],
        "style": inputs["style"],
    }
    batch = (inputs, ground_truth)

    # ONE executable for both scan lengths (bench.py's trick): the trip count
    # is a runtime fori_loop bound, so the expensive fwd+bwd VGG graph
    # compiles once instead of once per K — keeps a cold-cache run inside the
    # driver's timeout-570 budget.  The batch is a jit ARGUMENT, not a
    # closure: captured concrete arrays embed as HLO literals, and at batch 8
    # the ~250 MB constant blows the tunnel's remote_compile body limit
    # (HTTP 413) — found r5; this also shrinks every compile payload.
    def steps(state, batch, k):
        def body(_, carry):
            st, _loss = carry
            new_state, metrics = tm.train_step(st, batch)
            return new_state, jnp.sum(metrics["loss"])

        _, last = jax.lax.fori_loop(
            0, k, body, (state, jnp.zeros((), jnp.float32)))
        return last

    jitted = jax.jit(steps)

    t0 = time.time()
    for k in args.k:
        float(jax.device_get(jitted(state, batch, k)))
    print(f"warm-up/compile: {time.time() - t0:.1f}s", file=sys.stderr)

    if args.trace:
        from realtime_style_transfer_tpu.tracing.profiler import trace
        with trace(args.trace):
            float(jax.device_get(jitted(state, batch, args.k[0])))
        print(f"trace written to {args.trace}", file=sys.stderr)

    def best(k):
        best_t = float("inf")
        for _ in range(args.trials):
            t0 = time.perf_counter()
            float(jax.device_get(jitted(state, batch, k)))
            best_t = min(best_t, time.perf_counter() - t0)
        return best_t

    k0, k1 = args.k
    t_short, t_long = best(k0), best(k1)
    per_step = (t_long - t_short) / (k1 - k0)
    print(json.dumps({
        "metric": "train_step_ms",
        "value": round(per_step * 1e3, 2),
        "spec": args.spec,
        "batch": b,
        "tower": args.tower,
        "remat": args.remat,
        "samples_per_sec": round(b / per_step, 2),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
