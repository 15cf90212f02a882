"""MobileNetV3-Small backbone in flax (feature extractor, no classifier head).

Architecture parity with ``tf.keras.applications.MobileNetV3Small(include_top=False,
include_preprocessing=False)`` as used by the reference for both the style predictor
(``/root/reference/realtime_style_transfer/models/stylePrediction.py:32-37``) and the
MobileNet loss tower (``styleLoss.py:155-193``).  Inputs are expected in [-1, 1]
(callers apply the reference's ``Rescaling(2, -1)``).

Residual-add outputs are captured under the reference's Keras layer names
(``expanded_conv_<i>/Add``) so the loss model can tap
``expanded_conv_{2,4,5,7}/Add`` (style) and ``expanded_conv_{9,10}/Add`` (content),
matching ``styleLoss.py:160-169``.

Pretrained ImageNet weights are NOT bundled (zero-egress build); use
``tools/convert_keras_weights.py`` to convert a Keras checkpoint into this module's
param pytree, or train from random init.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

# (kernel, expansion, out_filters, use_se, activation, stride) per inverted residual.
MOBILENETV3_SMALL_BLOCKS: Tuple[Tuple[int, int, int, bool, str, int], ...] = (
    (3, 16, 16, True, "relu", 2),
    (3, 72, 24, False, "relu", 2),
    (3, 88, 24, False, "relu", 1),
    (5, 96, 40, True, "hswish", 2),
    (5, 240, 40, True, "hswish", 1),
    (5, 240, 40, True, "hswish", 1),
    (5, 120, 48, True, "hswish", 1),
    (5, 144, 48, True, "hswish", 1),
    (5, 288, 96, True, "hswish", 2),
    (5, 576, 96, True, "hswish", 1),
    (5, 576, 96, True, "hswish", 1),
)

STYLE_TAPS = (
    "expanded_conv_2/Add",
    "expanded_conv_4/Add",
    "expanded_conv_5/Add",
    "expanded_conv_7/Add",
)
CONTENT_TAPS = (
    "expanded_conv_9/Add",
    "expanded_conv_10/Add",
)


def _depth(v: float, divisor: int = 8, min_value: int | None = None) -> int:
    """Keras ``_depth``: round channel counts to multiples of ``divisor``."""
    if min_value is None:
        min_value = divisor
    new_v = max(min_value, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


def hard_sigmoid(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.clip(x + 3.0, 0.0, 6.0) * (1.0 / 6.0)


def hard_swish(x: jnp.ndarray) -> jnp.ndarray:
    return x * hard_sigmoid(x)


_ACTS = {"relu": nn.relu, "hswish": hard_swish}


class SqueezeExcite(nn.Module):
    """SE block: GAP -> 1x1 conv (relu) -> 1x1 conv (hard sigmoid) -> scale."""

    se_filters: int
    filters: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(self.se_filters, (1, 1), dtype=self.dtype, name="se_reduce")(s)
        s = nn.relu(s)
        s = nn.Conv(self.filters, (1, 1), dtype=self.dtype, name="se_expand")(s)
        return x * hard_sigmoid(s)


class InvertedResidual(nn.Module):
    kernel: int
    expansion: int
    out_filters: int
    use_se: bool
    activation: str
    stride: int
    block_index: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False):
        act = _ACTS[self.activation]
        in_filters = x.shape[-1]
        shortcut = x

        def bn(name):
            return nn.BatchNorm(
                use_running_average=not train,
                momentum=0.999,
                epsilon=1e-3,
                dtype=self.dtype,
                name=name,
            )

        # Keras skips the expand conv on the very first block (expansion == input).
        if self.block_index > 0:
            x = nn.Conv(
                self.expansion, (1, 1), use_bias=False, dtype=self.dtype, name="expand"
            )(x)
            x = bn("expand_bn")(x)
            x = act(x)
        x = nn.Conv(
            x.shape[-1],
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding="SAME",
            feature_group_count=x.shape[-1],
            use_bias=False,
            dtype=self.dtype,
            name="depthwise",
        )(x)
        x = bn("depthwise_bn")(x)
        x = act(x)
        if self.use_se:
            x = SqueezeExcite(
                _depth(self.expansion * 0.25), x.shape[-1], dtype=self.dtype, name="se"
            )(x)
        x = nn.Conv(
            self.out_filters, (1, 1), use_bias=False, dtype=self.dtype, name="project"
        )(x)
        x = bn("project_bn")(x)

        has_add = self.stride == 1 and in_filters == self.out_filters
        if has_add:
            x = x + shortcut
        return x, has_add


class MobileNetV3Small(nn.Module):
    """Feature extractor; returns (features, taps) where taps holds captured layers."""

    capture: Sequence[str] = ()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, *, train: bool = False
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        taps: Dict[str, jnp.ndarray] = {}
        x = x.astype(self.dtype)
        x = nn.Conv(
            16, (3, 3), strides=(2, 2), padding="SAME", use_bias=False,
            dtype=self.dtype, name="stem_conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.999, epsilon=1e-3,
            dtype=self.dtype, name="stem_bn",
        )(x)
        x = hard_swish(x)

        for i, (k, exp, out, se, act, stride) in enumerate(MOBILENETV3_SMALL_BLOCKS):
            name = "expanded_conv" if i == 0 else f"expanded_conv_{i}"
            x, has_add = InvertedResidual(
                kernel=k, expansion=exp, out_filters=out, use_se=se, activation=act,
                stride=stride, block_index=i, dtype=self.dtype, name=name,
            )(x, train=train)
            tap_name = f"{name}/Add"
            if has_add and tap_name in self.capture:
                taps[tap_name] = x

        x = nn.Conv(576, (1, 1), use_bias=False, dtype=self.dtype, name="last_conv")(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.999, epsilon=1e-3,
            dtype=self.dtype, name="last_bn",
        )(x)
        x = hard_swish(x)
        return x, taps
