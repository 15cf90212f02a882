#!/usr/bin/env python
"""Per-segment frame-time bisect of the packed transfer path on the real TPU.

Times cumulative PREFIXES of the packed pipeline (pack, stem, contracts,
residual core, expands, final) with the same slope-fit methodology as bench.py
(K-frame jitted ``lax.scan`` with a true inter-frame data dependency; the
per-frame time is the slope between two scan lengths, which cancels the
tunnel's dispatch/fetch intercept).  Segment cost = difference of consecutive
prefix slopes.  This is the measurement tool behind the ROADMAP's frame-budget
table.

    PYTHONPATH=/root/repo:/root/.axon_site python tools/bisect_packed.py \
        [--spec rst-960-120-128-17] [--k 10 50] [--trials 3]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--spec", default="rst-960-120-128-17")
    p.add_argument("--k", type=int, nargs=2, default=(10, 50))
    p.add_argument("--trials", type=int, default=3)
    p.add_argument("--dtype", default="bfloat16")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from realtime_style_transfer_tpu.config import ShapeConfig
    from realtime_style_transfer_tpu.models.inference import (
        make_inference_model, plan_from_config,
    )
    from realtime_style_transfer_tpu.models.transfer import (
        CONTRACT_FILTER_SIZES, NUM_RESIDUAL_BLOCKS, STEM_FILTERS,
    )
    from realtime_style_transfer_tpu.models.transfer_packed import (
        _bn_affine, _packed_affine_relu, _packed_cin, _take_affine,
    )
    from realtime_style_transfer_tpu.ops.normalization import (
        conditional_instance_norm,
    )
    from realtime_style_transfer_tpu.ops.packed_conv import (
        pack, packed_conv, packed_conv_transpose_2x, unpack,
    )
    from realtime_style_transfer_tpu.ops.style_params import StyleParamCursor

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    config = ShapeConfig.from_spec(args.spec)
    plan = plan_from_config(config)
    model = make_inference_model(config, dtype=dtype)
    rng = jax.random.PRNGKey(0)
    content = jax.random.uniform(rng, (1,) + config.content_shape, jnp.float32)
    style = jax.random.uniform(rng, (1,) + config.style_shape, jnp.float32)
    variables = jax.jit(model.init, static_argnames=("train",))(
        rng, content, style, train=False
    )
    style_params = jax.jit(
        lambda v, s: model.apply(v, s, method=model.predict_style_params)
    )(variables, style)

    transfer_p = variables["params"]["transfer"]
    transfer_s = variables["batch_stats"]["transfer"]

    def conv_params(name):
        return (transfer_p[name]["kernel"].astype(dtype),
                transfer_p[name]["bias"].astype(dtype))

    # Stage list mirrors models.transfer_packed.stylize_packed (keep in sync).
    def run_stages(content_in, style_params_in, upto: int):
        cursor = StyleParamCursor(style_params_in[:, None, :, :].astype(jnp.float32))
        stage = 0
        x = pack(content_in.astype(dtype), 2)
        if stage == upto:
            return x
        schedule = [("contract_0_conv", "contract_0_bn", 1, 2, 2, STEM_FILTERS)]
        for ci in range(plan.num_contract_blocks):
            last = ci == plan.num_contract_blocks - 1
            schedule.append(
                (f"contract_{ci + 1}_conv", f"contract_{ci + 1}_bn", 2, 2,
                 1 if last else 2, CONTRACT_FILTER_SIZES[ci][0])
            )
        for conv_name, bn_name, stride, fin, fout, _cout in schedule:
            kernel, bias = conv_params(conv_name)
            eff_scale, eff_bias = _bn_affine(transfer_p[bn_name],
                                             transfer_s[bn_name])
            x = packed_conv(x, kernel, stride=stride, fin=fin, fout=fout)
            x = x + jnp.tile(bias, fout * fout)
            x = jax.nn.relu(x)
            x = _packed_affine_relu(x, eff_scale, eff_bias, fout, dtype)
            stage += 1
            if stage == upto:
                return x
        filters = plan.bottleneck_num_filters
        for ri in range(NUM_RESIDUAL_BLOCKS):
            fx = x
            for ci in range(2):
                kernel, bias = conv_params(f"residual_{ri}_conv{ci}")
                fx = jax.lax.conv_general_dilated(
                    fx, kernel, (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                ) + bias
                fx = jax.nn.relu(fx)
                scale, bias_c = _take_affine(cursor, None, filters)
                fx = conditional_instance_norm(
                    fx, scale, bias_c, epsilon=1e-5
                ).astype(dtype)
                if ci == 0:
                    fx = jax.nn.relu(fx)
            x = fx if ri == 0 else x + fx
        stage += 1
        if stage == upto:
            return x
        wp = x.shape[2]
        for ei in range(plan.num_expand_blocks):
            filters_e = plan.expand_blocks[ei][0]
            fin, fout = 2 ** ei, 2 ** (ei + 1)
            kernel, bias = conv_params(f"expand_{ei}_conv")
            x = packed_conv_transpose_2x(x, kernel, fin=fin, fout=fout)
            x = x + jnp.tile(bias, fout * fout)
            scale, bias_c = _take_affine(cursor, None, filters_e)
            x = jax.nn.relu(_packed_cin(
                x, scale, bias_c, fout, filters_e, epsilon=1e-5, dtype=dtype,
            ))
            stage += 1
            if stage == upto:
                return x
        f_final = 2 ** plan.num_expand_blocks
        fin_filters = plan.expand_blocks[-1][0]
        kernel, bias = conv_params(f"expand_{plan.num_expand_blocks}_conv")
        x = packed_conv(x, kernel, stride=1, fin=f_final, fout=f_final)
        x = x + jnp.tile(bias, f_final * f_final)
        scale, bias_c = _take_affine(cursor, None, fin_filters)
        x = _packed_cin(x, scale, bias_c, f_final, fin_filters,
                        epsilon=1e-5, dtype=dtype)
        x = jax.nn.sigmoid(x)
        return unpack(x, f_final, fin_filters).astype(jnp.float32)

    stage_names = (
        ["pack", "stem"]
        + [f"contract_{i + 1}" for i in range(plan.num_contract_blocks)]
        + ["residual_core"]
        + [f"expand_{i}" for i in range(plan.num_expand_blocks)]
        + ["final"]
    )
    n_stages = len(stage_names)

    def make_stream(upto, k):
        def frame_stream(content_in, style_params_in):
            def step(carry, _):
                out = run_stages(carry, style_params_in, upto)
                m = jnp.mean(out).astype(carry.dtype)
                carry = jax.lax.dynamic_update_slice(
                    carry, m[None, None, None, None], (0, 0, 0, 0)
                )
                return carry, m
            _, means = jax.lax.scan(step, content_in, None, length=k)
            return jnp.sum(means)

        stream = jax.jit(frame_stream)
        float(jax.device_get(stream(content, style_params)))  # warm/compile
        return stream

    def best_elapsed(stream):
        best = float("inf")
        for _ in range(args.trials):
            t0 = time.perf_counter()
            float(jax.device_get(stream(content, style_params)))
            best = min(best, time.perf_counter() - t0)
        return best

    k_short, k_long = args.k
    prefix_ms = []
    for upto in range(n_stages):
        t_s = best_elapsed(make_stream(upto, k_short))
        t_l = best_elapsed(make_stream(upto, k_long))
        slope_ms = (t_l - t_s) / (k_long - k_short) * 1e3
        prefix_ms.append(slope_ms)
        print(f"prefix through {stage_names[upto]:>14s}: {slope_ms:8.3f} ms",
              flush=True)

    print()
    segments = {}
    prev = 0.0
    for name, cum in zip(stage_names, prefix_ms):
        segments[name] = round(cum - prev, 3)
        prev = cum
    print(json.dumps({"spec": args.spec, "prefix_ms": dict(
        zip(stage_names, [round(v, 3) for v in prefix_ms])),
        "segment_ms": segments,
        "device": str(jax.devices()[0])}))


if __name__ == "__main__":
    main()
