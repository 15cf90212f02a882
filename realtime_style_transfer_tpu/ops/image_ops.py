"""Image-space ops: gram matrices, total variation, L2 batch losses, mip pyramids.

TPU notes: the gram matrix is one big contraction per feature map — exactly what the
MXU wants.  We express it as a single ``jnp.einsum`` with f32 accumulation
(``preferred_element_type``) so XLA tiles it onto the systolic array; inputs may be
bf16.  Semantics match the reference
(``/root/reference/realtime_style_transfer/models/styleLoss.py:11-37`` for gram,
``styleLoss.py:290-292`` for the batch L2, ``styleLoss.py:337`` for TV via
``tf.image.total_variation``, ``styleTransfer.py:335-345`` for weight-map mips).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp


def gram_matrix(features: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> (B, C, C) gram matrix normalized by H*W."""
    b, h, w, c = features.shape
    f = features.reshape(b, h * w, c)
    # Loss-path op: force full f32 MXU passes (default precision is bf16-grade,
    # which visibly perturbs gram differences and hence the style loss).
    gram = jnp.einsum(
        "bic,bid->bcd", f, f,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return gram / jnp.float32(h * w)


def mean_l2_loss_on_batch(t: jnp.ndarray) -> jnp.ndarray:
    """Mean of 0.5 * t^2 over all non-batch axes -> (B,)."""
    axes = tuple(range(1, t.ndim))
    return jnp.mean(0.5 * jnp.square(t.astype(jnp.float32)), axis=axes)


def total_variation(images: jnp.ndarray) -> jnp.ndarray:
    """Anisotropic total variation, summed per image -> (B,).

    Matches ``tf.image.total_variation``: sum of absolute differences along H and W.
    """
    x = images.astype(jnp.float32)
    dh = jnp.abs(x[:, 1:, :, :] - x[:, :-1, :, :])
    dw = jnp.abs(x[:, :, 1:, :] - x[:, :, :-1, :])
    axes = (1, 2, 3)
    return jnp.sum(dh, axis=axes) + jnp.sum(dw, axis=axes)


def avg_pool_2x(x: jnp.ndarray) -> jnp.ndarray:
    """2x2 stride-2 average pool (NHWC), the mip downsample step."""
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    ) * 0.25


def style_weight_mips(style_weights: jnp.ndarray, num_mips: int) -> Dict[int, jnp.ndarray]:
    """AvgPool mip pyramid of the per-pixel weight map, keyed by width.

    Reference ``styleTransfer.py:335-345``: each resolution of the decoder picks the
    mip whose width matches its feature map.
    """
    mips: Dict[int, jnp.ndarray] = {style_weights.shape[-2]: style_weights}
    last = style_weights
    for _ in range(num_mips):
        last = avg_pool_2x(last)
        mips[last.shape[-2]] = last
    return mips
