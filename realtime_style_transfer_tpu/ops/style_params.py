"""Flat style-parameter vector slicing and per-pixel style blending.

The transfer network consumes ONE flat style vector per style; every conditional
instance norm slices two consecutive ranges (scale, bias) out of it.  The slicing
order defines the on-disk/engine buffer layout (192 floats for the 32-filter
variant, 2662 for 128 filters), so it is part of the framework's ABI.

Re-design of the reference's ``StyleParamStack`` cursor class
(``/root/reference/realtime_style_transfer/models/styleTransfer.py:12-44``) as a pure
functional cursor that is jit/trace friendly: the cursor is plain Python ints resolved
at trace time (all slice bounds are static), so XLA sees static slices.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


class StyleParamCursor:
    """Static cursor over the flat style-parameter axis (the last axis).

    ``style_params`` has shape (..., num_styles, P).  ``take(n)`` returns the next
    ``n`` parameters and advances; bounds are Python ints -> static slices under jit.
    """

    def __init__(self, style_params: jnp.ndarray):
        self.style_params = style_params
        self.offset = 0

    def take(self, num_params: int) -> jnp.ndarray:
        lo = self.offset
        hi = lo + num_params
        if hi > self.style_params.shape[-1]:
            raise ValueError(
                f"style param cursor overflow: want [{lo}:{hi}] of "
                f"{self.style_params.shape[-1]}"
            )
        self.offset = hi
        return self.style_params[..., lo:hi]

    def assert_consumed(self) -> None:
        if self.offset != self.style_params.shape[-1]:
            raise ValueError(
                f"style params not fully consumed: used {self.offset} of "
                f"{self.style_params.shape[-1]}"
            )


def apply_style_weights(
    style_weights: Optional[jnp.ndarray], style_params: jnp.ndarray
) -> jnp.ndarray:
    """Blend per-style parameter slices by a per-pixel weight map.

    ``style_params``: (B, 1, S, C) slice of the flat vector; ``style_weights``:
    (B, H, W, S).  Only the exactly-two-styles case blends (matching reference
    ``styleTransfer.py:36-44``); anything else passes through.  Returns
    (B, H, W, C) when blending, else the input unchanged.
    """
    if style_weights is None or style_params.shape[-2] != 2:
        return style_params
    # (B, 1, S, C) -> (B, 1, 1, S, C); weights (B, H, W, S) -> (B, H, W, S, 1)
    params = style_params[:, :, None, :, :]
    weights = style_weights[..., None]
    blended = jnp.sum(params * weights, axis=-2)  # (B, H|1, W|H?, ...)
    # params (B,1,1,S,C) * weights (B,H,W,S,1) -> (B,H,W,S,C) -> sum -> (B,H,W,C)
    return blended


def concat_implicit_weight(style_weights: jnp.ndarray) -> jnp.ndarray:
    """Prepend the implicit first-style weight ``1 - sum(w)``.

    Reference ``styleTransfer.py:297-302``: the network input carries only
    ``num_styles - 1`` weight channels; the first style's weight is implied.
    """
    sum_of_weights = jnp.sum(style_weights, axis=-1, keepdims=True)
    return jnp.concatenate([1.0 - sum_of_weights, style_weights], axis=-1)
