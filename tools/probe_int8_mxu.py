"""Probe: does a Pallas int8 matmul reach the v5e's 2x int8 MXU peak?

Decides whether an opt-in int8-quantized fused-transfer path is worth
building: the fused kernel's frame time is ~1.56 ms of which ~1.10 ms is
the bf16 MXU floor (ROADMAP "Executed-FLOP audit"); int8 would halve that
floor IF Mosaic lowers int8 x int8 -> int32 dots onto the MXU's int8 mode.

Measures, via the same scan-slope methodology as bench.py (the tunneled
TPU pays ~30-250 ms RTT per dispatch and block_until_ready does not
block, so per-call timing is useless):
  1. bf16 x bf16 -> f32 pallas matmul at a res-core-like shape
  2. int8 x int8 -> int32 pallas matmul at the same shape
  3. the XLA (non-pallas) equivalents as cross-checks

Run on the real TPU: `python tools/probe_int8_mxu.py`.

Interpretation: int8/bf16 slope ratio ~0.5 => invest in the quantized
path; ratio ~1.0 => Mosaic runs int8 through the bf16 pipeline (upcast),
record the negative result in ROADMAP.md and stop.
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Res-core-like tile: (th*wp, cin) x (cin, cout) done NREP times per step,
# mirroring one band's tap matmuls. th=10, wp=240 -> 2400 rows.
# Env overrides allow a tiny CPU-interpret smoke (tests/conftest tier).
M = int(os.environ.get("PROBE_M", 2400))
K = int(os.environ.get("PROBE_K", 128))
N = int(os.environ.get("PROBE_N", 128))
NREP = int(os.environ.get("PROBE_NREP", 32))
K_LO = int(os.environ.get("PROBE_KLO", 8))
K_HI = int(os.environ.get("PROBE_KHI", 32))


def _mm_kernel(x_ref, w_ref, o_ref, acc_dtype):
    o_ref[...] = jnp.dot(x_ref[...], w_ref[...],
                         preferred_element_type=acc_dtype)


def make_pallas_mm(dtype, acc_dtype):
    interpret = os.environ.get("RST_PLATFORM") == "cpu"

    def call(x, w):
        return pl.pallas_call(
            lambda xr, wr, orf: _mm_kernel(xr, wr, orf, acc_dtype),
            out_shape=jax.ShapeDtypeStruct((M, N), acc_dtype),
            interpret=interpret,
        )(x, w)
    return call


def slope_ms(step_fn, x, w, k_lo=K_LO, k_hi=K_HI):
    """Time K-chained scans at two lengths; slope removes fixed overheads."""
    def chain(k):
        def body(carry, _):
            x_c, s = carry
            o = step_fn(x_c, w)
            # real data dependency BOTH ways: the output feeds the next
            # step's input (else XLA hoists the loop-invariant step out of
            # the scan) and the running sum (else dead-code elimination)
            s = s + o[0, 0].astype(jnp.float32)
            upd = (o[0, 0] % 3 - 1).astype(x_c.dtype) if \
                x_c.dtype == jnp.int8 else o[0, 0].astype(x_c.dtype)
            x_c = x_c.at[0, 0].set(upd)
            return (x_c, s), ()

        @jax.jit
        def run(x, w):
            (_, s), _ = jax.lax.scan(body, (x, jnp.float32(0.0)),
                                     None, length=k)
            return s
        return run

    times = {}
    for k in (k_lo, k_hi):
        f = chain(k)
        s = f(x, w)
        float(s)  # warm compile + fetch
        t0 = time.perf_counter()
        s = f(x, w)
        float(s)
        t1 = time.perf_counter()
        times[k] = t1 - t0
    return (times[k_hi] - times[k_lo]) / (k_hi - k_lo) * 1e3


def make_band_mm(dtype, acc_dtype):
    """Band-realistic probe: the fused kernel's exact access pattern.

    Mirrors fused_transfer.run_conv's full band body: a bf16 activation
    band is (for the int8 arm) quantized in-kernel with the f32 chain,
    masked-stored into a padded 'temp' scratch at the content column
    offset (sublane offset 1 — int8 sublane granularity is 32 vs bf16's
    8, so this store is the pattern Mosaic must tolerate, not just the
    reads), then sliced into dx slabs / dy row windows, reshaped to
    (th*wp, cin) patches, 9 tap matmuls accumulated (res-core shape
    th=10, wp=240).
    """
    TH, WP, CIN, COUT, PH, PW = 10, 240, 128, 128, 3, 3
    rows = TH + PH - 1
    wpad = _round_up_probe(WP + PW - 1, 8)
    interpret = os.environ.get("RST_PLATFORM") == "cpu"
    quant = dtype == jnp.int8

    def kern(x_ref, k_ref, inv_ref, o_ref, temp):
        xt = x_ref[...]
        if quant:
            inv = inv_ref[0:1, :].reshape(1, 1, CIN)
            xt_q = jnp.clip(
                jnp.rint(xt.astype(jnp.float32) * inv),
                -127.0, 127.0).astype(jnp.int8)
        else:
            xt_q = xt
        temp[...] = jnp.zeros((rows, wpad, CIN), temp.dtype)
        temp[pl.ds(0, rows), 1:1 + WP, :] = xt_q
        acc = jnp.zeros((TH * WP, COUT), acc_dtype)
        for dx in range(PW):
            slab = temp[:, dx:dx + WP, :]
            for dy in range(PH):
                patch = slab[dy:dy + TH].reshape(TH * WP, CIN)
                acc += jnp.dot(patch, k_ref[dy, dx],
                               preferred_element_type=acc_dtype)
        o_ref[...] = acc

    def call(x, k, inv):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((TH * WP, COUT), acc_dtype),
            scratch_shapes=[pltpu.VMEM((rows, wpad, CIN), dtype)],
            interpret=interpret,
        )(x, k, inv)
    return call, (rows, WP, CIN), (PH, PW, CIN, COUT), 2 * TH * WP * CIN * COUT * PH * PW


def _round_up_probe(x, m):
    return (x + m - 1) // m * m


def main():
    if os.environ.get("RST_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["RST_PLATFORM"])
    dev = jax.devices()[0]
    print(f"device: {dev}", flush=True)

    rng = np.random.default_rng(0)
    xb = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
    wb = jnp.asarray(rng.standard_normal((K, N)), jnp.bfloat16)
    xi = jnp.asarray(rng.integers(-127, 127, (M, K)), jnp.int8)
    wi = jnp.asarray(rng.integers(-127, 127, (K, N)), jnp.int8)

    flops = 2 * M * K * N * NREP

    def rep(mm, cast):
        def step(x, w):
            o = mm(x, w)
            for _ in range(NREP - 1):
                # serialize: each mm's input depends on the previous output
                # (distinct inputs also defeat CSE across repetitions)
                x = x.at[0, 0].set(cast(o[0, 0]))
                o = mm(x, w)
            return o
        return step

    results = {}
    for name, mm, x, w, cast in (
        ("pallas_bf16", make_pallas_mm(jnp.bfloat16, jnp.float32),
         xb, wb, lambda v: v.astype(jnp.bfloat16)),
        ("pallas_int8", make_pallas_mm(jnp.int8, jnp.int32),
         xi, wi, lambda v: (v % 3 - 1).astype(jnp.int8)),
        ("xla_bf16",
         lambda x, w: jnp.dot(x, w, preferred_element_type=jnp.float32),
         xb, wb, lambda v: v.astype(jnp.bfloat16)),
        ("xla_int8",
         lambda x, w: jnp.dot(x, w, preferred_element_type=jnp.int32),
         xi, wi, lambda v: (v % 3 - 1).astype(jnp.int8)),
    ):
        try:
            ms = slope_ms(rep(mm, cast), x, w)
            tflops = flops / (ms * 1e-3) / 1e12
            results[name] = (ms, tflops)
            print(f"{name:12s}: {ms:7.3f} ms/step  {tflops:7.1f} TOP/s",
                  flush=True)
        except Exception as exc:  # noqa: BLE001 - probe must report, not die
            results[name] = None
            print(f"{name:12s}: FAILED {exc!r}", flush=True)

    # --- band-realistic probes (the fused kernel's exact slicing pattern) ---
    for name, dtype, acc_dtype in (
        ("band_bf16", jnp.bfloat16, jnp.float32),
        ("band_int8", jnp.int8, jnp.int32),
    ):
        mm, x_shape, k_shape, flops1 = make_band_mm(dtype, acc_dtype)
        # the activation band is bf16 in BOTH arms (the int8 arm quantizes
        # in-kernel, exactly like quant='int8'); only the kernel weights
        # and the temp/matmul dtype differ
        x = jnp.asarray(rng.standard_normal(x_shape), jnp.bfloat16)
        if dtype == jnp.int8:
            k_ = jnp.asarray(rng.integers(-127, 127, k_shape), dtype)
        else:
            k_ = jnp.asarray(rng.standard_normal(k_shape), dtype)
        inv = jnp.asarray(
            np.full((1, x_shape[-1]), 127.0 / 4.0, np.float32))

        def band_step(x, k_, mm=mm, inv=inv):
            o = mm(x, k_, inv)
            for _ in range(NREP - 1):
                x = x.at[0, 0, 0].set(o[0, 0].astype(jnp.bfloat16))
                o = mm(x, k_, inv)
            return o

        try:
            ms = slope_ms(band_step, x, k_)
            tflops = flops1 * NREP / (ms * 1e-3) / 1e12
            results[name] = (ms, tflops)
            print(f"{name:12s}: {ms:7.3f} ms/step  {tflops:7.1f} TOP/s",
                  flush=True)
        except Exception as exc:  # noqa: BLE001
            results[name] = None
            print(f"{name:12s}: FAILED {exc!r}", flush=True)

    for a, b, tag in (("pallas_int8", "pallas_bf16", "plain"),
                      ("band_int8", "band_bf16", "band")):
        if results.get(a) and results.get(b):
            r = results[a][0] / results[b][0]
            print(f"int8/bf16 {tag} time ratio: {r:.2f} "
                  f"({'INVEST' if r < 0.7 else 'negative result'})")


if __name__ == "__main__":
    sys.exit(main())
