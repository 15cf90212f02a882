#!/usr/bin/env python
"""Secondary TPU benchmarks: dual-style fused, and packed-path FPS for specs
outside the fused kernel's envelope (e.g. rst-1920-120-128-17, 3 contracts).

Same slope methodology as bench.py (tunneled TPU: chain K frames in one
jitted fori_loop with a scalar inter-frame dependency, fit the slope).

Usage:
  timeout 570 python tools/bench_variants.py dual
  timeout 570 python tools/bench_variants.py packed --spec rst-1920-120-128-17
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

BASELINE_FPS = 50.0


def slope_fps(stream, frame, k_short=20, k_long=100, trials=4):
    def best(k):
        best_t = float("inf")
        for _ in range(trials):
            t0 = time.perf_counter()
            float(jax.device_get(stream(frame, k)))
            best_t = min(best_t, time.perf_counter() - t0)
        return best_t

    float(jax.device_get(stream(frame, 2)))  # compile
    t_short, t_long = best(k_short), best(k_long)
    per = (t_long - t_short) / (k_long - k_short)
    return 1.0 / per, per


def scalar_dep_loop(apply_fn):
    def stream(frame, k):
        def body(_i, carry):
            frame, acc = carry
            out = apply_fn(frame)
            m = jnp.mean(out.astype(jnp.float32))
            frame = jax.lax.dynamic_update_slice(
                frame, m.astype(frame.dtype)[(None,) * frame.ndim],
                (0,) * frame.ndim)
            return frame, acc + m

        _, acc = jax.lax.fori_loop(0, k, body, (frame, jnp.float32(0.0)))
        return acc

    return jax.jit(stream, static_argnums=())


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("mode", choices=("dual", "packed", "fused"))
    p.add_argument("--spec", default="rst-960-120-128-17")
    args = p.parse_args()

    from realtime_style_transfer_tpu.config import ShapeConfig
    from realtime_style_transfer_tpu.models.inference import (
        make_inference_model,
        plan_from_config,
    )

    num_styles = 2 if args.mode == "dual" else 1
    config = ShapeConfig.from_spec(args.spec, num_styles=num_styles)
    plan = plan_from_config(config)
    model = make_inference_model(config, dtype=jnp.bfloat16)

    rng = jax.random.PRNGKey(0)
    content = jax.random.uniform(rng, (1,) + config.content_shape, jnp.float32)
    style = jax.random.uniform(rng, (1,) + config.style_shape, jnp.float32)
    init_kwargs = {}
    if num_styles > 1:
        init_kwargs["style_weights"] = jax.random.uniform(
            rng, (1,) + config.style_weights_shape, jnp.float32)
    variables = jax.jit(model.init, static_argnames=("train",))(
        rng, content, style, train=False, **init_kwargs)
    style_params = jax.jit(
        lambda v, s: model.apply(v, s, method=model.predict_style_params)
    )(variables, style)

    if args.mode in ("dual", "fused"):
        from realtime_style_transfer_tpu.ops.pallas.fused_transfer import (
            FusedTransfer,
        )

        fused = FusedTransfer(
            jax.device_get(variables), plan, num_styles=num_styles)
        if args.mode == "dual":
            weights = jax.random.uniform(
                rng, (1,) + config.style_weights_shape, jnp.float32)
            prepared = fused.prepare_style(style_params, weights)
            label = f"{args.spec}_dual_fps_per_chip"
            path = "fused-prepacked-dual"
        else:
            prepared = fused.prepare_style(style_params)
            label = f"{args.spec}_fused_fps_per_chip"
            path = "fused-prepacked"
        frame0 = fused.pack_frame(content)
        apply_fn = lambda f: fused._unpack_out(  # noqa: E731
            fused._run_packed(f, prepared))
    else:
        from realtime_style_transfer_tpu.models.transfer_packed import (
            stylize_packed,
        )

        frame0 = content
        apply_fn = lambda f: stylize_packed(  # noqa: E731
            variables, f, style_params, plan=plan, dtype=jnp.bfloat16)
        label = f"{args.spec}_packed_fps_per_chip"
        path = "packed"

    stream = scalar_dep_loop(apply_fn)
    fps, per = slope_fps(stream, frame0)
    print(json.dumps({
        "metric": label,
        "value": round(fps, 2),
        "unit": "frames/sec",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
        "frame_ms": round(per * 1e3, 3),  # best-of-trials slope estimate
        "path": path,
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
