"""Conditional instance normalization (CIN) — the hot normalization op.

Semantics match the reference layer
(``/root/reference/realtime_style_transfer/models/styleTransfer.py:47-92``):
per-(batch, channel) spatial moments over (H, W), ``x * rsqrt(var + eps) -
mean * rsqrt(var + eps)``, then ``bias + x * scale`` where scale/bias come from the
flat style vector (optionally blended per-pixel across two styles).

Two implementations:

* ``conditional_instance_norm`` — pure jnp; XLA fuses this well and it is fully
  differentiable.  Used on CPU, for autodiff, and as the numerical oracle.
* a fused Pallas TPU kernel in ``realtime_style_transfer_tpu.ops.pallas.cin``
  (moments + rsqrt + affine in one VMEM pass) selected via ``use_pallas=True``
  on TPU backends.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .style_params import StyleParamCursor, apply_style_weights

NUM_PARAMS_PER_FEATURE = 2  # scale + bias, reference styleTransfer.py:49


def instance_moments(x: jnp.ndarray):
    """Spatial mean/variance per (batch, channel) for NHWC input, f32 accumulation."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
    var = jnp.mean(jnp.square(xf), axis=(1, 2), keepdims=True) - jnp.square(mean)
    return mean, var


def conditional_instance_norm(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    *,
    epsilon: float = 1e-5,
) -> jnp.ndarray:
    """Normalize NHWC ``x`` per instance and apply style affine.

    ``scale``/``bias`` broadcast against (B, H, W, C): they are either (B, 1, C)
    slices (single style; broadcasting inserts the W axis) or per-pixel
    (B, H, W, C) maps after two-style blending.
    """
    mean, var = instance_moments(x)
    inv = jax.lax.rsqrt(var + jnp.float32(epsilon))
    x = x * inv.astype(x.dtype) + (-mean * inv).astype(x.dtype)
    return bias.astype(x.dtype) + x * scale.astype(x.dtype)


def cin_from_cursor(
    x: jnp.ndarray,
    cursor: StyleParamCursor,
    style_weights: Optional[jnp.ndarray],
    *,
    epsilon: float = 1e-5,
    use_pallas: bool = False,
) -> jnp.ndarray:
    """Slice (scale, bias) for ``x``'s channel count off ``cursor`` and apply CIN.

    Matches the reference layer's slice order: scale first, then bias
    (``styleTransfer.py:62-63``).
    """
    num_features = x.shape[-1]
    scale = apply_style_weights(style_weights, cursor.take(num_features))
    bias = apply_style_weights(style_weights, cursor.take(num_features))
    if use_pallas and style_weights is None:
        from .pallas.cin import cin_pallas

        return cin_pallas(x, scale, bias, epsilon=epsilon)
    return conditional_instance_norm(x, scale, bias, epsilon=epsilon)
