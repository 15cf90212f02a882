"""Deployable inference graph: style predictor + transfer net in one module.

Re-design of ``/root/reference/realtime_style_transfer/models/
styleTransferInferenceModel.py:9-48``.  The reference unstacks the style axis and
loops the predictor per style image; on TPU we fold styles into the batch axis and
run the predictor ONCE (identical math — the predictor is per-image — but one big
MXU-friendly batch instead of S sequential calls).

Exposed methods (via ``module.apply(..., method=...)``):

* ``__call__(content, style[, style_weights])`` — full inference
* ``predict_style_params(style_images)`` — predictor only (engine-interop path,
  reference ``predict_style_params.py``)
* ``stylize(content, style_params[, style_weights])`` — transfer only (the per-frame
  hot loop of ``predict_video_using_checkpoint.py:93-98``)
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ..config import ShapeConfig
from .predictor import StylePredictor
from .transfer import StyleTransferNet, TransferPlan, make_transfer_plan


def plan_from_config(config: ShapeConfig) -> TransferPlan:
    return make_transfer_plan(
        config.content_shape,
        config.output_shape,
        config.bottleneck_res_y,
        config.bottleneck_num_filters,
    )


class StyleTransferInference(nn.Module):
    """content (B,H,W,C) + style (B,S,H,W,3) [+ weights (B,H,W,S-1)] -> (B,H,W,3)."""

    plan: TransferPlan
    num_styles: int = 1
    feature_extractor: str = "mobilenet"
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False

    def setup(self):
        self.style_predictor = StylePredictor(
            num_top_parameters=self.plan.num_style_parameters,
            feature_extractor=self.feature_extractor,
            dtype=self.dtype,
        )
        self.transfer = StyleTransferNet(
            plan=self.plan,
            num_styles=self.num_styles,
            dtype=self.dtype,
            use_pallas=self.use_pallas,
        )

    def predict_style_params(
        self, style_images: jnp.ndarray, *, train: bool = False
    ) -> jnp.ndarray:
        """(B, S, H, W, 3) or (B, H, W, 3) -> (B, S, P) or (B, P)."""
        if style_images.ndim == 4:
            return self.style_predictor(style_images, train=train)
        b, s = style_images.shape[:2]
        flat = style_images.reshape((b * s,) + style_images.shape[2:])
        params = self.style_predictor(flat, train=train)
        return params.reshape(b, s, -1)

    def stylize(
        self,
        content: jnp.ndarray,
        style_params: jnp.ndarray,
        style_weights: Optional[jnp.ndarray] = None,
        *,
        train: bool = False,
    ) -> jnp.ndarray:
        return self.transfer(content, style_params, style_weights, train=train)

    def __call__(
        self,
        content: jnp.ndarray,
        style: jnp.ndarray,
        style_weights: Optional[jnp.ndarray] = None,
        *,
        train: bool = False,
    ) -> jnp.ndarray:
        style_params = self.predict_style_params(style, train=train)
        return self.stylize(content, style_params, style_weights, train=train)


def make_inference_model(
    config: ShapeConfig,
    *,
    dtype: jnp.dtype = jnp.float32,
    use_pallas: bool = False,
    feature_extractor: Optional[str] = None,
) -> StyleTransferInference:
    return StyleTransferInference(
        plan=plan_from_config(config),
        num_styles=config.num_styles,
        feature_extractor=feature_extractor or config.feature_extractor,
        dtype=dtype,
        use_pallas=use_pallas,
    )
