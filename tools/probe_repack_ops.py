"""Probe: which row-(de)interleave formulations lower in Mosaic on the v5e.

The rst-1920 two-segment fused kernel (VERDICT r4 task 1) changes grids
mid-net: c2's (240,480) band output must land in the (120,240) bottleneck
grid's f2 channel layout (two L rows -> one S row, channel-stacked), and
e1's inverse.  The column fold is a free row-major reshape; the ROW pairing
is a sublane interleave, with three candidate formulations:

  a) strided slice            v[0::2]            (lax.slice w/ stride)
  b) reshape + index          v.reshape(th//2, 2, ...)[:, 0]
  c) permutation matmul       P @ v.reshape(th, -1)  (always lowers; MXU-cheap)

Run on the real chip: compiles each inside a pallas_call, checks values vs
numpy, and slope-times a band-realistic shape.  Usage:
    python tools/probe_repack_ops.py
"""
import functools
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TH, W, C = 8, 240, 256  # c2-band-realistic: (th, wp/2, 2*cout) bf16


def deint_a(v):
    return jnp.concatenate([v[0::2], v[1::2]], axis=-1)


def deint_b(v):
    r = v.reshape(TH // 2, 2, W, C)
    return jnp.concatenate([r[:, 0], r[:, 1]], axis=-1)


def deint_c(v):
    # rows of P pick even then odd source rows; output block rows 0..th/2-1
    # are even sources, th/2.. are odd -> reshape splits them, concat stacks
    p = np.zeros((TH, TH), np.float32)
    for i in range(TH // 2):
        p[i, 2 * i] = 1.0
        p[TH // 2 + i, 2 * i + 1] = 1.0
    pj = jnp.asarray(p, jnp.bfloat16)
    flat = v.reshape(TH, W * C)
    y = jnp.dot(pj, flat, preferred_element_type=jnp.float32)
    y = y.astype(jnp.bfloat16).reshape(TH, W, C)
    return jnp.concatenate([y[: TH // 2], y[TH // 2:]], axis=-1)


def int_a(a, b):
    z = jnp.stack([a, b], axis=1)
    return z.reshape(TH, W, C)


def int_c(a, b):
    p = np.zeros((TH, TH), np.float32)
    for i in range(TH // 2):
        p[2 * i, i] = 1.0
        p[2 * i + 1, TH // 2 + i] = 1.0
    pj = jnp.asarray(p, jnp.bfloat16)
    stacked = jnp.concatenate([a, b], axis=0).reshape(TH, W * C)
    y = jnp.dot(pj, stacked, preferred_element_type=jnp.float32)
    return y.astype(jnp.bfloat16).reshape(TH, W, C)


def run_case(name, fn, inputs, want):
    def kernel(*refs):
        *ins, out = refs
        out[...] = fn(*(r[...] for r in ins))

    try:
        got = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(want.shape, jnp.bfloat16),
        )(*inputs)
        got = np.asarray(got, np.float32)
        ok = np.array_equal(got, np.asarray(want, np.float32))
        print(f"{name}: compiled, values {'OK' if ok else 'MISMATCH'}")
        return ok
    except Exception as e:  # noqa: BLE001 — report the Mosaic error and move on
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}")
        return False


def main():
    rng = np.random.default_rng(0)
    v = rng.standard_normal((TH, W, C)).astype(np.float32)
    vj = jnp.asarray(v, jnp.bfloat16)
    vf = np.asarray(vj, np.float32)
    want_deint = np.concatenate([vf[0::2], vf[1::2]], axis=-1)
    a_np, b_np = vf[: TH // 2] * 0 + vf[0::2], vf[1::2]
    aj = jnp.asarray(vf[0::2], jnp.bfloat16)
    bj = jnp.asarray(vf[1::2], jnp.bfloat16)
    want_int = np.zeros_like(vf)
    want_int[0::2] = np.asarray(aj, np.float32)
    want_int[1::2] = np.asarray(bj, np.float32)

    print(f"devices: {jax.devices()}")
    results = {}
    results["deint_strided"] = run_case("deint_strided", deint_a, [vj],
                                        want_deint)
    results["deint_reshape"] = run_case("deint_reshape", deint_b, [vj],
                                        want_deint)
    # matmul variant is bf16-rounded through f32 acc of 0/1 matrix: exact
    results["deint_matmul"] = run_case("deint_matmul", deint_c, [vj],
                                       want_deint)
    results["int_stack"] = run_case("int_stack", int_a, [aj, bj], want_int)
    results["int_matmul"] = run_case("int_matmul", int_c, [aj, bj], want_int)

    # ---- the shipped repack forms at deploy band shapes (v5e results) ----
    # fold2 (c2 -> bottleneck grid): lane-FOLD casts lower, even straight
    # from the 2D matmul-accumulator shape.  unfold2 one-shot
    # (stack -> (2th, 2wp, C/4) reshape) is REJECTED ("unsupported shape
    # cast"); the shipped decomposition — row interleave with lanes
    # unchanged, then a lane->column unfold cast with each column-parity
    # block pre-padded to a LANE multiple — compiles and is exact.
    th, wp, c = 8, 480, 128
    f = rng.standard_normal((th, wp, c)).astype(np.float32)
    fj = jnp.asarray(f, jnp.bfloat16)
    ff = np.asarray(fj, np.float32)
    rf = ff.reshape(th // 2, 2, wp // 2, 2 * c)
    want_fold = np.concatenate([rf[:, 0], rf[:, 1]], -1)

    def fold2(x):
        r = x.reshape(th // 2, 2, wp // 2, 2 * c)
        return jnp.concatenate([r[:, 0], r[:, 1]], -1)

    results["fold2_full"] = run_case("fold2_full", fold2, [fj], want_fold)

    th2, wp2, c2 = 10, 240, 256
    half, q, obc = c2 // 2, c2 // 4, 128
    u = rng.standard_normal((th2, wp2, c2)).astype(np.float32)
    uj = jnp.asarray(u, jnp.bfloat16)
    uf2 = np.asarray(uj, np.float32)
    zf = np.stack([uf2[:, :, :half], uf2[:, :, half:]],
                  axis=1).reshape(2 * th2, wp2, half)
    w64 = zf.reshape(2 * th2, 2 * wp2, q)
    want_unf = np.concatenate(
        [w64, np.zeros((2 * th2, 2 * wp2, obc - q), np.float32)], -1)

    def unfold2_oneshot(x):
        z = jnp.stack([x[:, :, :half], x[:, :, half:]], axis=1)
        y = z.reshape(2 * th2, 2 * wp2, q)
        return jnp.concatenate(
            [y, jnp.zeros((2 * th2, 2 * wp2, obc - q), y.dtype)], -1)

    def unfold2_padfirst(x):
        z = jnp.stack([x[:, :, :half], x[:, :, half:]],
                      axis=1).reshape(2 * th2, wp2, half)
        pad = jnp.zeros((2 * th2, wp2, obc - q), z.dtype)
        zp = jnp.concatenate([z[:, :, :q], pad, z[:, :, q:], pad], -1)
        return zp.reshape(2 * th2, 2 * wp2, obc)

    results["unfold2_oneshot"] = run_case(
        "unfold2_oneshot", unfold2_oneshot, [uj], want_unf)
    results["unfold2_padfirst"] = run_case(
        "unfold2_padfirst", unfold2_padfirst, [uj], want_unf)
    print(results)


if __name__ == "__main__":
    sys.exit(main())
