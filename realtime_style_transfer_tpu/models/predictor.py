"""Style prediction network: style image -> flat style-parameter vector.

Re-design of the reference predictor
(``/root/reference/realtime_style_transfer/models/stylePrediction.py:25-75``):
backbone (dummy conv / MobileNetV3-Small / EfficientNetV2-S) -> global average pool
(keepdims) -> 1x1 conv to a 100-dim bottleneck -> 1x1 conv to the transfer net's
parameter count -> squeeze.  The non-dummy backbones rescale [0,1] inputs to [-1,1]
(reference ``stylePrediction.py:37``).

Initializer parity: VarianceScaling(1/3, fan_out, uniform) kernels and 0.5 bias on
both head convs (``stylePrediction.py:9-16,59-70``).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .backbones.mobilenetv3 import MobileNetV3Small

DUMMY = "dummy"
MOBILE_NET = "mobilenet"
EFFICIENT_NET = "efficientnet"

HEAD_KERNEL_INIT = nn.initializers.variance_scaling(
    scale=1.0 / 3.0, mode="fan_out", distribution="uniform"
)
HEAD_BIAS_INIT = nn.initializers.constant(0.5)


class StylePredictor(nn.Module):
    """Maps (B, H, W, 3) style images in [0, 1] to (B, num_top_parameters)."""

    num_top_parameters: int
    feature_extractor: str = MOBILE_NET
    num_style_parameters: int = 100  # bottleneck width, stylePrediction.py:26
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, style_image: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        x = style_image.astype(self.dtype)
        if self.feature_extractor == DUMMY:
            # stylePrediction.py:30-31: single 9x9 stride-5 conv stand-in for tests
            x = nn.Conv(
                1, (9, 9), strides=(5, 5), padding="SAME",
                dtype=self.dtype, name="dummy_conv",
            )(x)
        elif self.feature_extractor == MOBILE_NET:
            x = x * 2.0 - 1.0  # Rescaling(2, -1), stylePrediction.py:37
            x, _ = MobileNetV3Small(dtype=self.dtype, name="backbone")(x, train=train)
        elif self.feature_extractor == EFFICIENT_NET:
            from .backbones.efficientnet import EfficientNetV2S

            x = x * 2.0 - 1.0
            x, _ = EfficientNetV2S(dtype=self.dtype, name="backbone")(x, train=train)
        else:
            raise ValueError(f"unknown feature_extractor {self.feature_extractor!r}")

        x = jnp.mean(x, axis=(1, 2), keepdims=True)  # GAP, keepdims
        x = nn.Conv(
            self.num_style_parameters, (1, 1),
            kernel_init=HEAD_KERNEL_INIT, bias_init=HEAD_BIAS_INIT,
            dtype=self.dtype, name="StylePredictor",
        )(x)
        x = nn.Conv(
            self.num_top_parameters, (1, 1),
            kernel_init=HEAD_KERNEL_INIT, bias_init=HEAD_BIAS_INIT,
            dtype=self.dtype, name="StyleNormPredictor",
        )(x)
        return jnp.squeeze(x, axis=(1, 2)).astype(jnp.float32)
