"""Monocular depth network + depth loss ("depth-aware style transfer" term).

The reference pulls MiDaS v2 from TF Hub and wraps it per-sample because the hub
layer is unbatched (``/root/reference/realtime_style_transfer/models/styleLoss.py:
223-287``).  That artifact is a hosted binary we cannot (and should not) bundle, so
this module provides:

* ``MidasLite`` — a compact, fully-batched encoder/decoder depth net in flax with the
  same interface (384x384 RGB in, 384x384 inverse-depth out).  Weights are loadable
  from an Orbax/npz checkpoint (converted MiDaS or self-trained); random init is the
  documented fallback for offline builds and tests.
* ``make_depth_loss_fn`` — mean-L2 difference of predicted depths between ground
  truth and prediction, "according to Liu et al. 2017" (``styleLoss.py:277-285``).
  Unlike the reference there is no per-sample ``tf.map_fn``: the whole batch runs in
  one jitted call (one MXU-friendly batched forward instead of B sequential ones).

A ``normalize_depth``/``ssitrim_loss`` pair mirrors the reference's scale/shift
invariant trimmed loss (``styleLoss.py:261-272``, unused there, kept for parity).
"""

from __future__ import annotations

from typing import Callable

import flax.linen as nn
import jax
import jax.numpy as jnp

DEPTH_RESOLUTION = 384


class _ResBlock(nn.Module):
    filters: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.relu(nn.Conv(self.filters, (3, 3), padding="SAME", dtype=self.dtype)(x))
        h = nn.Conv(self.filters, (3, 3), padding="SAME", dtype=self.dtype)(h)
        return nn.relu(x + h)


class MidasLite(nn.Module):
    """Compact multi-scale depth estimator: 4-stage encoder + fused decoder.

    Input (B, 384, 384, 3) in [0, 1]; output (B, 384, 384) non-negative inverse depth.
    """

    dtype: jnp.dtype = jnp.float32
    base_filters: int = 32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        f = self.base_filters
        skips = []
        h = x.astype(self.dtype)
        for i, mult in enumerate((1, 2, 4, 8)):
            h = nn.Conv(
                f * mult, (3, 3), strides=(2, 2), padding="SAME",
                dtype=self.dtype, name=f"enc{i}_down",
            )(h)
            h = nn.relu(h)
            h = _ResBlock(f * mult, dtype=self.dtype, name=f"enc{i}_res")(h)
            skips.append(h)

        h = skips[-1]
        for i, mult in enumerate((4, 2, 1)):
            b, hh, ww, _ = h.shape
            h = jax.image.resize(h, (b, hh * 2, ww * 2, h.shape[-1]), "bilinear")
            h = nn.Conv(
                f * mult, (3, 3), padding="SAME", dtype=self.dtype, name=f"dec{i}_conv"
            )(h)
            h = nn.relu(h + skips[-2 - i])
            h = _ResBlock(f * mult, dtype=self.dtype, name=f"dec{i}_res")(h)

        b, hh, ww, _ = h.shape
        h = jax.image.resize(h, (b, hh * 2, ww * 2, h.shape[-1]), "bilinear")
        h = nn.Conv(1, (3, 3), padding="SAME", dtype=self.dtype, name="head")(h)
        return nn.relu(jnp.squeeze(h, axis=-1)).astype(jnp.float32)


def resize_for_depth(images: jnp.ndarray) -> jnp.ndarray:
    """Bilinear resize NHWC images to the depth net's 384x384 input."""
    b = images.shape[0]
    return jax.image.resize(
        images, (b, DEPTH_RESOLUTION, DEPTH_RESOLUTION, images.shape[-1]), "bilinear"
    )


def normalize_depth(d: jnp.ndarray) -> jnp.ndarray:
    """Scale/shift-invariant normalization (median + mean abs dev), styleLoss.py:261-264."""
    t = jnp.percentile(d, 50)
    s = jnp.mean(jnp.abs(d - t))
    return (d - t) / s


def ssitrim_loss(d1: jnp.ndarray, d2: jnp.ndarray) -> jnp.ndarray:
    """Trimmed scale/shift-invariant loss (reference ``ssitrim_loss``, unused there).

    The reference drops the top-20% absolute errors via boolean_mask — dynamic shapes,
    which XLA cannot compile; we mask to zero instead (same sum, static shape).
    """
    d1 = normalize_depth(d1)
    d2 = normalize_depth(d2)
    err = jnp.abs(d1 - d2)
    p80 = jnp.percentile(err, 80)
    trimmed = jnp.where(err < p80, err, 0.0)
    return 0.5 * jnp.sum(trimmed) / err.size


def make_depth_loss_fn(depth_apply: Callable[[jnp.ndarray], jnp.ndarray]):
    """Depth loss: mean L2 of depth difference over the batch -> (B,).

    ``depth_apply`` maps (B, 384, 384, 3) -> (B, 384, 384) with params bound.
    """
    from ..ops.image_ops import mean_l2_loss_on_batch

    def depth_loss(ground_truth_image: jnp.ndarray, predicted_image: jnp.ndarray):
        pred_depth = depth_apply(resize_for_depth(predicted_image))
        gt_depth = depth_apply(resize_for_depth(ground_truth_image))
        return mean_l2_loss_on_batch(gt_depth - pred_depth)

    return depth_loss
