"""EfficientNet backbones in flax: B3 (loss taps) and V2-S (predictor option).

Architecture parity with the Keras applications the reference uses:

* ``EfficientNetB3(include_top=False, include_preprocessing=False)`` — the
  EfficientNet loss extractor taps residual adds ``block{2c,3c,4e}_add`` (style)
  and ``block{5e,6f,7b}_add`` (content), reference ``styleLoss.py:112-152``.
* ``EfficientNetV2S(include_top=False, include_preprocessing=False)`` — the
  EFFICIENT_NET style-predictor backbone, reference ``stylePrediction.py:38-43``.

Tap outputs are captured under the Keras layer names so the reference's layer
lists work verbatim.  ImageNet weights are not bundled (zero-egress build); see
``tools/convert_keras_weights.py``.
"""

from __future__ import annotations

import math
from typing import Dict, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

# ---- EfficientNet (v1) -----------------------------------------------------

# B0 stage definitions: (expand_ratio, kernel, stride, repeats, out_filters)
EFFICIENTNET_V1_BLOCKS: Tuple[Tuple[int, int, int, int, int], ...] = (
    (1, 3, 1, 1, 16),
    (6, 3, 2, 2, 24),
    (6, 5, 2, 2, 40),
    (6, 3, 2, 3, 80),
    (6, 5, 1, 3, 112),
    (6, 5, 2, 4, 192),
    (6, 3, 1, 1, 320),
)

B3_WIDTH, B3_DEPTH = 1.2, 1.4

STYLE_TAPS_B3 = ("block2c_add", "block3c_add", "block4e_add")
CONTENT_TAPS_B3 = ("block5e_add", "block6f_add", "block7b_add")

# V2-S loss taps (framework extension; the reference's loss towers are
# VGG16/B3/MobileNetV3 only): last unit of each of the four shallow stages
# for multi-scale style statistics, one deep tap for content — the VGG
# pattern applied to the V2-S stage table.
STYLE_TAPS_V2S = ("block1b", "block2d", "block3d", "block4f")
CONTENT_TAPS_V2S = ("block5i",)


def round_filters(filters: float, width: float, divisor: int = 8) -> int:
    filters *= width
    new = max(divisor, int(filters + divisor / 2) // divisor * divisor)
    if new < 0.9 * filters:
        new += divisor
    return int(new)


def round_repeats(repeats: int, depth: float) -> int:
    return int(math.ceil(depth * repeats))


def _bn(train: bool, dtype, name: str) -> nn.BatchNorm:
    return nn.BatchNorm(
        use_running_average=not train, momentum=0.99, epsilon=1e-3,
        dtype=dtype, name=name,
    )


class Normalization(nn.Module):
    """Keras ``layers.Normalization`` twin: ``(x - mean) / max(sqrt(var), eps)``.

    The v1 Keras EfficientNets bake a ``Rescaling(1/255)`` + ``Normalization``
    pair into the graph UNCONDITIONALLY (they never grew the v2 family's
    ``include_preprocessing`` switch — the reference's
    ``include_preprocessing=False`` at ``styleLoss.py:135-137`` is a
    ``TypeError`` under every Keras that ships v1 EfficientNet, i.e. the
    reference's EfficientNet tower is bit-rotted; see
    ``tools/reference_oracle.py`` ``efficientnet_b3`` for the shim that makes
    it constructible).  An un-adapted layer (``weights=None`` builds) holds
    mean 0 / variance 1 and is the identity; an ImageNet import carries the
    dataset stats.  Stats live in ``batch_stats`` so one converted checkpoint
    round-trips through the BN-stats plumbing unchanged.
    """

    channels: int = 3

    @nn.compact
    def __call__(self, x):
        mean = self.variable(
            "batch_stats", "mean",
            lambda: jnp.zeros((self.channels,), jnp.float32))
        var = self.variable(
            "batch_stats", "variance",
            lambda: jnp.ones((self.channels,), jnp.float32))
        return (x - mean.value) / jnp.maximum(jnp.sqrt(var.value), 1e-7)


class MBConv(nn.Module):
    """EfficientNet v1 inverted bottleneck: expand -> depthwise -> SE -> project."""

    expand_ratio: int
    kernel: int
    stride: int
    out_filters: int
    se_ratio: float = 0.25
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        in_filters = x.shape[-1]
        shortcut = x
        h = x
        if self.expand_ratio != 1:
            h = nn.Conv(in_filters * self.expand_ratio, (1, 1), use_bias=False,
                        dtype=self.dtype, name="expand")(h)
            h = _bn(train, self.dtype, "expand_bn")(h)
            h = nn.silu(h)
        h = nn.Conv(
            h.shape[-1], (self.kernel, self.kernel),
            strides=(self.stride, self.stride), padding="SAME",
            feature_group_count=h.shape[-1], use_bias=False,
            dtype=self.dtype, name="depthwise",
        )(h)
        h = _bn(train, self.dtype, "depthwise_bn")(h)
        h = nn.silu(h)
        if self.se_ratio:
            se_filters = max(1, int(in_filters * self.se_ratio))
            s = jnp.mean(h, axis=(1, 2), keepdims=True)
            s = nn.Conv(se_filters, (1, 1), dtype=self.dtype, name="se_reduce")(s)
            s = nn.silu(s)
            s = nn.Conv(h.shape[-1], (1, 1), dtype=self.dtype, name="se_expand")(s)
            h = h * nn.sigmoid(s)
        h = nn.Conv(self.out_filters, (1, 1), use_bias=False,
                    dtype=self.dtype, name="project")(h)
        h = _bn(train, self.dtype, "project_bn")(h)
        has_add = self.stride == 1 and in_filters == self.out_filters
        if has_add:
            h = h + shortcut
        return h, has_add


class EfficientNetB3(nn.Module):
    """Feature extractor; returns (features, taps) like the other backbones."""

    capture: Sequence[str] = ()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        taps: Dict[str, jnp.ndarray] = {}
        h = x.astype(self.dtype)
        # v1 Keras bakes Rescaling(1/255) + Normalization into the graph
        # unconditionally (identity Normalization for random-init builds;
        # ImageNet stats for real imports) — see the Normalization docstring.
        h = h / 255.0
        h = Normalization(name="normalization")(h)
        h = nn.Conv(round_filters(32, B3_WIDTH), (3, 3), strides=(2, 2),
                    padding="SAME", use_bias=False, dtype=self.dtype,
                    name="stem_conv")(h)
        h = _bn(train, self.dtype, "stem_bn")(h)
        h = nn.silu(h)

        for stage, (exp, k, s, r, f) in enumerate(EFFICIENTNET_V1_BLOCKS, start=1):
            filters = round_filters(f, B3_WIDTH)
            for unit in range(round_repeats(r, B3_DEPTH)):
                letter = chr(ord("a") + unit)
                name = f"block{stage}{letter}"
                h, has_add = MBConv(
                    expand_ratio=exp, kernel=k,
                    stride=s if unit == 0 else 1, out_filters=filters,
                    dtype=self.dtype, name=name,
                )(h, train=train)
                tap = f"{name}_add"
                if has_add and tap in self.capture:
                    taps[tap] = h

        h = nn.Conv(round_filters(1280, B3_WIDTH), (1, 1), use_bias=False,
                    dtype=self.dtype, name="top_conv")(h)
        h = _bn(train, self.dtype, "top_bn")(h)
        h = nn.silu(h)
        return h, taps


# ---- EfficientNetV2-S --------------------------------------------------------

# (block_type, expand, kernel, stride, repeats, out_filters, se_ratio)
EFFICIENTNET_V2S_BLOCKS: Tuple[Tuple[str, int, int, int, int, int, float], ...] = (
    ("fused", 1, 3, 1, 2, 24, 0.0),
    ("fused", 4, 3, 2, 4, 48, 0.0),
    ("fused", 4, 3, 2, 4, 64, 0.0),
    ("mbconv", 4, 3, 2, 6, 128, 0.25),
    ("mbconv", 6, 3, 1, 9, 160, 0.25),
    ("mbconv", 6, 3, 2, 15, 256, 0.25),
)


class FusedMBConv(nn.Module):
    """V2 fused block: full kxk expand conv, then 1x1 project."""

    expand_ratio: int
    kernel: int
    stride: int
    out_filters: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        in_filters = x.shape[-1]
        shortcut = x
        if self.expand_ratio != 1:
            h = nn.Conv(in_filters * self.expand_ratio,
                        (self.kernel, self.kernel),
                        strides=(self.stride, self.stride), padding="SAME",
                        use_bias=False, dtype=self.dtype, name="expand")(x)
            h = _bn(train, self.dtype, "expand_bn")(h)
            h = nn.silu(h)
            h = nn.Conv(self.out_filters, (1, 1), use_bias=False,
                        dtype=self.dtype, name="project")(h)
            h = _bn(train, self.dtype, "project_bn")(h)
        else:
            h = nn.Conv(self.out_filters, (self.kernel, self.kernel),
                        strides=(self.stride, self.stride), padding="SAME",
                        use_bias=False, dtype=self.dtype, name="project")(x)
            h = _bn(train, self.dtype, "project_bn")(h)
            h = nn.silu(h)
        if self.stride == 1 and in_filters == self.out_filters:
            h = h + shortcut
        return h


class EfficientNetV2S(nn.Module):
    """V2-S feature extractor; returns (features, taps)."""

    capture: Sequence[str] = ()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        taps: Dict[str, jnp.ndarray] = {}
        h = x.astype(self.dtype)
        h = nn.Conv(24, (3, 3), strides=(2, 2), padding="SAME", use_bias=False,
                    dtype=self.dtype, name="stem_conv")(h)
        h = _bn(train, self.dtype, "stem_bn")(h)
        h = nn.silu(h)

        for stage, (kind, exp, k, s, r, f, se) in enumerate(
            EFFICIENTNET_V2S_BLOCKS, start=1
        ):
            for unit in range(r):
                name = f"block{stage}{chr(ord('a') + unit)}"
                stride = s if unit == 0 else 1
                if kind == "fused":
                    h = FusedMBConv(
                        expand_ratio=exp, kernel=k, stride=stride,
                        out_filters=f, dtype=self.dtype, name=name,
                    )(h, train=train)
                else:
                    h, _ = MBConv(
                        expand_ratio=exp, kernel=k, stride=stride,
                        out_filters=f, se_ratio=se, dtype=self.dtype, name=name,
                    )(h, train=train)
                if name in self.capture:
                    taps[name] = h

        h = nn.Conv(1280, (1, 1), use_bias=False, dtype=self.dtype,
                    name="top_conv")(h)
        h = _bn(train, self.dtype, "top_bn")(h)
        h = nn.silu(h)
        return h, taps
