"""Fused Pallas TPU kernels for conditional instance normalization.

STATUS: superseded research kernel.  Measured faster standalone but slower
in-net (the custom-call boundary forfeits XLA producer/consumer fusion;
ROADMAP "r1 Pallas findings"), so it ships opt-in (``use_pallas=True``); the
production Pallas path is the whole-net kernel in ``fused_transfer.py``.

The CIN sites are the transfer net's hottest non-conv op (12 sites/frame; 10 at the
bottleneck where (H, W, C) = (120, 240, 128)).  Two kernels, both tiled over H so
every block fits v5e's 16 MB scoped VMEM:

* ``stats``:     one pass over x computing per-channel sum AND sum-of-squares
                 together (XLA's lowering runs separate mean/variance reductions)
* ``normalize``: one pass applying ``x * (inv*scale) + (bias - mean*inv*scale)``

Total HBM traffic: 2 reads + 1 write of x — vs 3 reads + 1 write for the naive
moments+normalize lowering.  Accumulation is f32 regardless of input dtype; the
stats kernel revisits its (1, 2, C) output block consecutively per batch element
(legal revisit pattern).

Single-style path only (per-pixel blended scale/bias keeps the jnp path —
``ops.normalization``).  Backward is a custom VJP with the standard instance-norm
gradient, recomputing moments instead of saving activations.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Per-tile budget: Mosaic's scoped VMEM must hold the tile in/out buffers, their
# double-buffered copies, and f32 cast/square temporaries (~10-12x tile bytes);
# v5e's scoped limit is 16 MB.
TILE_BUDGET_BYTES = 512 * 1024

# Lane efficiency: the VPU is 8x128 lanes; below 64 channels most lanes idle and
# the jnp path (which XLA can fuse into neighbors) wins.
MIN_CHANNELS = 64


def _pick_tile(h: int, w: int, c: int, itemsize: int) -> int:
    for th in (128, 64, 48, 40, 32, 24, 16, 8, 5, 4, 3, 2, 1):
        if h % th == 0 and th * w * c * itemsize <= TILE_BUDGET_BYTES:
            return th
    return 1


def _stats_kernel(x_ref, stats_ref, *, inv_n: float):
    ht = pl.program_id(1)

    @pl.when(ht == 0)
    def _init():
        stats_ref[...] = jnp.zeros_like(stats_ref)

    x = x_ref[...].astype(jnp.float32)
    stats_ref[0, 0, :] += jnp.sum(x, axis=(0, 1, 2)) * inv_n
    stats_ref[0, 1, :] += jnp.sum(x * x, axis=(0, 1, 2)) * inv_n


def _normalize_kernel(x_ref, stats_ref, scale_ref, bias_ref, out_ref, *,
                      epsilon: float):
    mean = stats_ref[0, 0, :]
    var = stats_ref[0, 1, :] - mean * mean
    inv = jax.lax.rsqrt(var + epsilon)
    eff_scale = inv * scale_ref[0, :].astype(jnp.float32)          # (C,)
    eff_bias = bias_ref[0, :].astype(jnp.float32) - mean * eff_scale
    x = x_ref[...].astype(jnp.float32)
    out_ref[...] = (x * eff_scale + eff_bias).astype(out_ref.dtype)


def _cin_forward(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
                 epsilon: float) -> jnp.ndarray:
    b, h, w, c = x.shape
    if c < MIN_CHANNELS:
        from ..normalization import conditional_instance_norm

        return conditional_instance_norm(x, scale, bias, epsilon=epsilon)
    th = _pick_tile(h, w, c, x.dtype.itemsize)
    num_h_tiles = h // th

    x_spec = pl.BlockSpec((1, th, w, c), lambda bi, ht: (bi, ht, 0, 0),
                          memory_space=pltpu.VMEM)
    stats_spec = pl.BlockSpec((1, 2, c), lambda bi, ht: (bi, 0, 0),
                              memory_space=pltpu.VMEM)
    param_spec = pl.BlockSpec((1, c), lambda bi, ht: (bi, 0),
                              memory_space=pltpu.VMEM)

    stats = pl.pallas_call(
        functools.partial(_stats_kernel, inv_n=1.0 / float(h * w)),
        grid=(b, num_h_tiles),
        in_specs=[x_spec],
        out_specs=stats_spec,
        out_shape=jax.ShapeDtypeStruct((b, 2, c), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=3 * h * w * c,
            bytes_accessed=h * w * c * x.dtype.itemsize * b,
            transcendentals=0,
        ),
    )(x)

    return pl.pallas_call(
        functools.partial(_normalize_kernel, epsilon=float(epsilon)),
        grid=(b, num_h_tiles),
        in_specs=[x_spec, stats_spec, param_spec, param_spec],
        out_specs=x_spec,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        input_output_aliases={0: 0},  # normalize in place
        cost_estimate=pl.CostEstimate(
            flops=3 * h * w * c,
            bytes_accessed=2 * h * w * c * x.dtype.itemsize * b,
            transcendentals=c,
        ),
    )(x, stats, scale.reshape(b, c), bias.reshape(b, c))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def cin_pallas(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
               epsilon: float = 1e-5) -> jnp.ndarray:
    """Fused CIN: ``bias + (x - mean) * rsqrt(var + eps) * scale`` over (H, W).

    ``x``: (B, H, W, C); ``scale``/``bias``: broadcastable (B, 1, 1, C)-likes.
    """
    return _cin_forward(x, scale, bias, epsilon)


def _cin_fwd(x, scale, bias, epsilon):
    return _cin_forward(x, scale, bias, epsilon), (x, scale, bias)


def _cin_bwd(epsilon, residuals, g):
    x, scale, bias = residuals
    xf = x.astype(jnp.float32)
    gf = g.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
    var = jnp.mean(jnp.square(xf), axis=(1, 2), keepdims=True) - jnp.square(mean)
    inv = jax.lax.rsqrt(var + jnp.float32(epsilon))
    xhat = (xf - mean) * inv

    scale_shape, bias_shape = scale.shape, bias.shape
    dbias = jnp.sum(gf, axis=(1, 2), keepdims=True).reshape(bias_shape)
    dscale = jnp.sum(gf * xhat, axis=(1, 2), keepdims=True).reshape(scale_shape)

    scale_b = scale.astype(jnp.float32).reshape(
        scale.shape[0], 1, 1, scale.shape[-1]
    )
    dxhat = gf * scale_b
    m_dxhat = jnp.mean(dxhat, axis=(1, 2), keepdims=True)
    m_dxhat_xhat = jnp.mean(dxhat * xhat, axis=(1, 2), keepdims=True)
    dx = inv * (dxhat - m_dxhat - xhat * m_dxhat_xhat)
    return dx.astype(x.dtype), dscale.astype(scale.dtype), dbias.astype(bias.dtype)


cin_pallas.defvjp(_cin_fwd, _cin_bwd)
