"""Probe how far the Mosaic scoped-VMEM cap can actually be raised on v5e.

ROADMAP finding 11 established that the 16 MB scoped-VMEM limit is a compiler
default (`vmem_limit_bytes`), not hardware — the v5e has 128 MB physical VMEM
— and that raising it to 18 MB fixes real OOMs with no measured perf change.
Several r3 design rejections (the direct-DMA ring restructure, the rst-1920
uniform-f8 grid whose packed stem kernel alone is 18.9 MB) assumed the 16 MB
ceiling.  This probe answers two questions per candidate cap:

  1. does a kernel whose scoped scratch is ~cap-4 MB compile AND run?
  2. does a FIXED workload (a band-realistic tap-matmul loop that itself only
     needs ~6 MB) slow down when compiled under the raised cap — i.e. is
     there a hidden cost (clock, serialization, double-buffer eviction) to
     just asking for more VMEM?

Timing follows the tunneled-TPU rules (CLAUDE.md): K reps chained in one
jitted fori_loop with a data dependency, slope across two K values.

MEASURED (r3, real v5e through the tunnel): every cap 16-120 MB compiles and
runs (scratch up to 116 MB), and the fixed workload's slope times are noise
around zero (the ~0.03 ms workload is below tunnel slope resolution) with no
cap-correlated trend — i.e. no hidden cost to raising the cap.  The follow-up
band-budget sweep is in ROADMAP finding 12: taller fused-kernel bands are
monotonically WORSE, so the probe's value is compile capability, not speed.

Usage: timeout 570 python tools/probe_vmem_cap.py [--caps 16 24 32 48 64 96]
"""

from __future__ import annotations

import argparse
import functools
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MB = 2 ** 20


def _scratch_kernel(x_ref, o_ref, scratch_ref, *, reps: int):
    """Touch a large VMEM scratch end-to-end so it can't be elided."""
    rows = scratch_ref.shape[0]
    scratch_ref[...] = jnp.broadcast_to(x_ref[...], scratch_ref.shape)

    def body(i, acc):
        r = jax.lax.rem(i * 7, rows - 8)
        blk = scratch_ref[pl.ds(r, 8), :]
        return acc + jnp.sum(blk, axis=0, keepdims=True)

    o_ref[...] = jax.lax.fori_loop(0, reps, body, jnp.zeros((1, 128),
                                                            jnp.float32))


def try_alloc(cap_mb: int) -> dict:
    """Compile+run a kernel whose scratch is ~cap-4 MB under cap_mb."""
    scratch_mb = cap_mb - 4
    rows = (scratch_mb * MB) // (128 * 4)
    rows = max(8, (rows // 8) * 8)
    x = jnp.ones((1, 128), jnp.float32)
    fn = pl.pallas_call(
        functools.partial(_scratch_kernel, reps=4),
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((rows, 128), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=cap_mb * MB),
    )
    try:
        out = np.asarray(jax.jit(fn)(x))
        ok = bool(np.isfinite(out).all())
        return {"cap_mb": cap_mb, "scratch_mb": rows * 128 * 4 / MB,
                "alloc_ok": ok}
    except Exception as e:  # compile-time OOM is the expected failure mode
        msg = str(e).split("\n")[0][:160]
        return {"cap_mb": cap_mb, "scratch_mb": rows * 128 * 4 / MB,
                "alloc_ok": False, "error": msg}


def _work_kernel(x_ref, w_ref, o_ref, acc_ref, tmp_ref, *, reps: int):
    """Band-realistic fixed workload: tap matmuls off a VMEM temp (~6 MB)."""
    tmp_ref[...] = jnp.broadcast_to(x_ref[...], tmp_ref.shape).astype(
        jnp.bfloat16)

    def body(i, acc):
        del i
        t = tmp_ref[...]
        for tap in range(3):
            acc = acc + jax.lax.dot_general(
                t, w_ref[tap],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        return acc

    acc_ref[...] = jax.lax.fori_loop(
        0, reps, body, jnp.zeros(acc_ref.shape, jnp.float32))
    o_ref[...] = acc_ref[0:1, :]


def work_time_ms(cap_mb: int, k_lo: int = 8, k_hi: int = 32) -> float:
    """Slope-time the fixed workload compiled under cap_mb."""
    m, kdim, n = 2400, 128, 128
    x = jnp.ones((1, kdim), jnp.float32)
    w = jnp.asarray(np.random.default_rng(0).standard_normal(
        (3, kdim, n)).astype(jnp.bfloat16))

    def step(reps):
        fn = pl.pallas_call(
            functools.partial(_work_kernel, reps=reps),
            out_shape=jax.ShapeDtypeStruct((1, n), jnp.float32),
            scratch_shapes=[pltpu.VMEM((m, n), jnp.float32),
                            pltpu.VMEM((m, kdim), jnp.bfloat16)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=cap_mb * MB),
        )

        def loop(x):
            def body(i, carry):
                out = fn(carry, w)
                return carry.at[0, 0].set(out[0, 0] * 1e-9)

            return jax.lax.fori_loop(0, 4, body, x)

        return jax.jit(loop)

    times = {}
    for reps in (k_lo, k_hi):
        f = step(reps)
        float(f(x)[0, 0])  # compile + warm
        t0 = time.perf_counter()
        float(f(x)[0, 0])
        times[reps] = time.perf_counter() - t0
    return (times[k_hi] - times[k_lo]) / (k_hi - k_lo) * 1e3 / 4


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--caps", type=int, nargs="+",
                    default=[16, 24, 32, 48, 64, 96, 120])
    ap.add_argument("--work", action="store_true",
                    help="also slope-time the fixed workload per cap")
    args = ap.parse_args()

    if os.environ.get("RST_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["RST_PLATFORM"])
    print(f"device: {jax.devices()[0]}", file=sys.stderr)

    for cap in args.caps:
        r = try_alloc(cap)
        if args.work and r["alloc_ok"]:
            r["work_ms"] = round(work_time_ms(cap), 4)
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
