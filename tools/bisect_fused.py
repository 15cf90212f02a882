#!/usr/bin/env python
"""Per-stage time bisect INSIDE the fused whole-net kernel (real TPU).

Builds truncated variants of the fused kernel (``debug_stages=k``) and
slope-fits each prefix exactly like bench.py; stage cost = consecutive prefix
difference.  This is the measurement behind the fused kernel's optimization
log in ROADMAP.md.

    PYTHONPATH=/root/repo:/root/.axon_site python tools/bisect_fused.py \
        [--spec rst-960-120-128-17] [--k 10 50] [--stages 0 17]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    str(Path(__file__).resolve().parent.parent / ".jax_cache"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--spec", default="rst-960-120-128-17")
    p.add_argument("--k", type=int, nargs=2, default=(10, 50))
    p.add_argument("--trials", type=int, default=3)
    p.add_argument("--stages", type=int, nargs=2, default=None,
                   help="stage index range to bisect (default: all)")
    p.add_argument("--quant", choices=("none", "int8"), default="none",
                   help="bisect the int8 engine (self-calibrated on the "
                        "bench content) instead of bf16 — per-stage view "
                        "of where the 2x MXU peak does/doesn't materialize")
    args = p.parse_args()

    import jax

    if os.environ.get("RST_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["RST_PLATFORM"])
    import jax.numpy as jnp

    from realtime_style_transfer_tpu.config import ShapeConfig
    from realtime_style_transfer_tpu.models.inference import (
        make_inference_model, plan_from_config,
    )
    from realtime_style_transfer_tpu.ops.pallas.fused_transfer import (
        FusedTransfer,
    )

    config = ShapeConfig.from_spec(args.spec)
    plan = plan_from_config(config)
    model = make_inference_model(config, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    content = jax.random.uniform(rng, (1,) + config.content_shape, jnp.float32)
    style = jax.random.uniform(rng, (1,) + config.style_shape, jnp.float32)
    variables = jax.jit(model.init, static_argnames=("train",))(
        rng, content, style, train=False)
    style_params = jax.jit(
        lambda v, s: model.apply(v, s, method=model.predict_style_params)
    )(variables, style)
    host_vars = jax.device_get(variables)

    interpret = jax.devices()[0].platform == "cpu"
    full = FusedTransfer(host_vars, plan, interpret=interpret)
    names = [st.name for st in full.stages]
    n_stages = len(names)
    lo, hi = args.stages or (0, n_stages)
    quant = None if args.quant == "none" else args.quant
    act_scales = None
    if quant:
        # scales are per-stage rows: one full-net calibration serves every
        # truncated (debug_stages) variant
        act_scales = full.calibrate_act_scales(
            [full.pack_frame(content)], full.prepare_style(style_params))

    def measure(k_stages):
        fused = FusedTransfer(host_vars, plan, debug_stages=k_stages,
                              interpret=interpret,
                              quant=quant, act_scales=act_scales)

        def make_stream(k):
            def frame_stream(content, style_params):
                def step(carry, _):
                    res = fused._forward_raw(carry, style_params)
                    m = (jnp.mean(res[1].astype(jnp.float32))
                         + jnp.mean(res[2].astype(jnp.float32)))
                    carry = jax.lax.dynamic_update_slice(
                        carry, m[None, None, None, None].astype(carry.dtype),
                        (0, 0, 0, 0))
                    return carry, m
                _, means = jax.lax.scan(step, content, None, length=k)
                return jnp.sum(means)
            s = jax.jit(frame_stream)
            float(jax.device_get(s(content, style_params)))
            return s

        def best(stream):
            b = float("inf")
            for _ in range(args.trials):
                t0 = time.perf_counter()
                float(jax.device_get(stream(content, style_params)))
                b = min(b, time.perf_counter() - t0)
            return b

        k0, k1 = args.k
        t0 = best(make_stream(k0))
        t1 = best(make_stream(k1))
        return (t1 - t0) / (k1 - k0) * 1e3

    prefix = {}
    prev = 0.0
    for k in range(lo, hi + 1):
        if k == 0:
            continue
        ms = measure(k)
        prefix[names[k - 1]] = round(ms, 3)
        print(f"prefix through {names[k - 1]:>8s} ({k:2d}): {ms:7.3f} ms "
              f"(stage {ms - prev:+.3f})", flush=True)
        prev = ms
    print(json.dumps({"spec": args.spec, "quant": args.quant,
                      "prefix_ms": prefix,
                      "device": str(jax.devices()[0])}))


if __name__ == "__main__":
    main()
