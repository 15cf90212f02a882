#!/usr/bin/env python
"""Same-session A/B/A for a FusedTransfer constructor knob on the real TPU.

Builds TWO engines in one process (knob off / on), slope-fits each with the
driver methodology (chained fori_loop frames, two K values), and prints one
JSON line per arm in A/B/A order so tunnel-session drift is visible.

Usage:
  timeout 570 python tools/ab_fused_knob.py k_resident
  timeout 570 python tools/ab_fused_knob.py k_resident --spec rst-1920-120-128-17
  timeout 570 python tools/ab_fused_knob.py wb_expanded --dual
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


def slope_ms(stream, frame, k_short=20, k_long=100, trials=4):
    def best(k):
        best_t = float("inf")
        for _ in range(trials):
            t0 = time.perf_counter()
            float(jax.device_get(stream(frame, k)))
            best_t = min(best_t, time.perf_counter() - t0)
        return best_t

    t_short, t_long = best(k_short), best(k_long)
    return (t_long - t_short) / (k_long - k_short) * 1e3


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

    return jax.jit(stream)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("knob", help="FusedTransfer constructor kwarg to A/B")
    p.add_argument("--spec", default="rst-960-120-128-17")
    p.add_argument("--dual", action="store_true")
    p.add_argument("--quant", action="store_true")
    args = p.parse_args()

    from realtime_style_transfer_tpu.config import ShapeConfig
    from realtime_style_transfer_tpu.models.inference import (
        make_inference_model,
        plan_from_config,
    )
    from realtime_style_transfer_tpu.ops.pallas.fused_transfer import (
        FusedTransfer,
    )

    num_styles = 2 if args.dual else 1
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
    host_vars = jax.device_get(variables)

    def build(val):
        kw = {args.knob: val, "num_styles": num_styles}
        if args.quant:
            cal = FusedTransfer(host_vars, plan, num_styles=num_styles)
            weights = None
            if num_styles > 1:
                weights = jax.random.uniform(
                    rng, (1,) + config.style_weights_shape, jnp.float32)
            scales = cal.calibrate_act_scales(
                cal.pack_frame(content),
                cal.prepare_style(style_params, weights)
                if weights is not None else cal.prepare_style(style_params))
            kw.update(quant="int8", act_scales=scales)
        eng = FusedTransfer(host_vars, plan, **kw)
        weights = None
        if num_styles > 1:
            weights = jax.random.uniform(
                rng, (1,) + config.style_weights_shape, jnp.float32)
        prep = (eng.prepare_style(style_params, weights)
                if weights is not None else eng.prepare_style(style_params))
        frame = eng.pack_frame(content)
        apply_fn = lambda f: eng._unpack_out(  # noqa: E731
            eng._run_packed(f, prep))
        stream = scalar_dep_loop(apply_fn)
        float(jax.device_get(stream(frame, 2)))  # compile
        return stream, frame

    s_off, f_off = build(False)
    s_on, f_on = build(True)

    results = []
    for arm, (s, f) in (("off", (s_off, f_off)), ("on", (s_on, f_on)),
                        ("off2", (s_off, f_off))):
        ms = slope_ms(s, f)
        results.append((arm, ms))
        print(json.dumps({
            "knob": args.knob, "arm": arm, "spec": args.spec,
            "dual": args.dual, "quant": args.quant,
            "frame_ms": round(ms, 4), "fps": round(1e3 / ms, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
