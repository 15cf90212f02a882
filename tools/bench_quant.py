"""Bench the int8-quantized fused kernel vs the bf16 one (real TPU).

Same scan-slope methodology as bench.py (tunneled-TPU timing rules in
CLAUDE.md): K pre-packed frames chained through one jitted lax.scan with a
scalar inter-frame dependency, slope-fit across two K values.  Prints one
JSON line per engine:

    {"engine": "bf16", "ms_per_frame": ..., "fps": ...}
    {"engine": "int8", "ms_per_frame": ..., "fps": ..., "max_err": ...,
     "median_err": ..., "psnr_db": ...}

The int8 engine is calibrated on the bench content itself (per-channel
activation maxima via FusedTransfer.calibrate_act_scales), which is the
deploy flow.  Scales are per (checkpoint, style): the maxima are captured
post-CIN-affine, so they depend on the prepared style table — calibrate
with the style(s) you deploy (np.maximum the per-style results for a
multi-style engine).

Usage: timeout 570 python tools/bench_quant.py [--spec rst-960-120-128-17]
(re-run until warm: the tunnel's server-side compile cache is keyed by HLO
and the int8 kernel compiles cold the first time).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np

from realtime_style_transfer_tpu.config import ShapeConfig
from realtime_style_transfer_tpu.models.inference import plan_from_config
from realtime_style_transfer_tpu.models.transfer import StyleTransferNet
from realtime_style_transfer_tpu.ops.pallas.fused_transfer import (
    FusedTransfer,
)

K_LO = int(os.environ.get("BENCH_KLO", 32))
K_HI = int(os.environ.get("BENCH_KHI", 128))


def slope_ms(stream, packed, prepared):
    times = {}
    for k in (K_LO, K_HI):
        s = stream(packed, prepared, k)
        float(s)  # warm (compile + fetch)
        t0 = time.perf_counter()
        float(stream(packed, prepared, k))
        t1 = time.perf_counter()
        times[k] = t1 - t0
    return (times[K_HI] - times[K_LO]) / (K_HI - K_LO) * 1e3


def make_stream(ft):
    # One executable for BOTH scan lengths (bench.py's rule): the frame
    # count is a runtime fori_loop bound, so each Mosaic kernel compiles
    # exactly once cold — two engines here means two cold compiles, not four.
    def frame_loop(packed, prepared, k):
        def body(_i, carry):
            p, s = carry
            out = ft._run_packed(p, prepared)[0]
            v = out[0, 0, 0].astype(jnp.bfloat16)
            # scalar dependency: next frame differs, compute can't collapse
            p = p.at[0, 0, 0].set(v)
            return p, s + v.astype(jnp.float32)

        _, s = jax.lax.fori_loop(0, k, body, (packed, jnp.float32(0.0)))
        return s

    return jax.jit(frame_loop)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--spec", default="rst-960-120-128-17")
    ap.add_argument("--num_styles", type=int, default=1)
    args = ap.parse_args()

    if os.environ.get("RST_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["RST_PLATFORM"])
    interpret = jax.devices()[0].platform != "tpu"

    cfg = ShapeConfig.from_spec(args.spec, num_styles=args.num_styles,
                                hdr=True)
    plan = plan_from_config(cfg)
    net = StyleTransferNet(plan=plan, num_styles=args.num_styles)
    rng = np.random.default_rng(7)
    content = jnp.asarray(
        rng.random((1,) + cfg.content_shape).astype(np.float32))
    style_params = jnp.asarray(
        (rng.random((1, args.num_styles, plan.num_style_parameters)) * 0.4
         + 0.8).astype(np.float32))
    kwargs = {}
    if args.num_styles == 2:
        h, w, _ = cfg.content_shape
        yy = np.linspace(0, 1, h, dtype=np.float32)[None, :, None, None]
        kwargs["style_weights"] = jnp.asarray(
            np.broadcast_to(yy, (1, h, w, 1)).copy())
    variables = jax.device_get(jax.jit(
        net.init, static_argnames=("train",))(
        jax.random.PRNGKey(3), content, style_params, train=False, **kwargs))

    ft = FusedTransfer(variables, plan, num_styles=args.num_styles,
                       interpret=interpret)
    prepared = ft.prepare_style(style_params, kwargs.get("style_weights"))
    packed = ft.pack_frame(content)
    ref = np.asarray(ft.stylize_prepacked(packed, prepared), np.float32)

    ms = slope_ms(make_stream(ft), packed, prepared)
    print(json.dumps({"engine": "bf16", "ms_per_frame": round(ms, 4),
                      "fps": round(1000.0 / ms, 1)}), flush=True)

    scales = ft.calibrate_act_scales([packed], prepared)
    ftq = FusedTransfer(variables, plan, num_styles=args.num_styles,
                        interpret=interpret, quant="int8", act_scales=scales)
    prepared_q = ftq.prepare_style(style_params, kwargs.get("style_weights"))
    got = np.asarray(ftq.stylize_prepacked(packed, prepared_q), np.float32)
    err = np.abs(got - ref)
    mse = float(np.mean((got - ref) ** 2))
    psnr = 10 * np.log10(1.0 / max(mse, 1e-12))

    ms_q = slope_ms(make_stream(ftq), packed, prepared_q)
    print(json.dumps({
        "engine": "int8", "ms_per_frame": round(ms_q, 4),
        "fps": round(1000.0 / ms_q, 1),
        "max_err": round(float(err.max()), 5),
        "median_err": round(float(np.median(err)), 6),
        "psnr_db": round(psnr, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
