"""The real-time style-transfer network (encoder -> residual core -> decoder).

TPU-native re-design of the reference transfer net
(``/root/reference/realtime_style_transfer/models/styleTransfer.py:95-345``).  The
architecture contract is preserved exactly — block-count math, filter schedules, the
flat style-parameter slicing order (the engine ABI), and the weight-map mip pyramid —
but the implementation is a flax.linen module over jitted XLA convolutions, NHWC
layout, with bf16 compute supported via the ``dtype`` field and f32 parameters.

Architecture (reference ``styleTransfer.py:213-332``):

* ``ceil(log2(in_y) - log2(bottleneck_y))`` contract blocks after a 9x9 stride-1 stem
* 5 residual blocks at the bottleneck, each 2x[Conv3x3 -> CIN], skip-add except #0
* ``ceil(log2(out_y) - log2(bottleneck_y))`` expand blocks (ConvTranspose -> CIN ->
  ReLU), then a final 9x9 stride-1 expand with sigmoid
* multi-style: implicit weight ``1 - sum(w)`` is prepended and an AvgPool mip pyramid
  of the weight map (keyed by width) feeds each resolution
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.conv import conv_s2d, conv_transpose_2x
from ..ops.image_ops import style_weight_mips
from ..ops.normalization import NUM_PARAMS_PER_FEATURE, cin_from_cursor
from ..ops.style_params import StyleParamCursor, concat_implicit_weight


def _s2d_factor(features: int, stride: int, kernel: int, h: int, w: int) -> int:
    """Largest output-packing factor that fills (but doesn't overflow) 128 lanes."""
    for f in (4, 2):
        if (features * f * f <= 128 and h % (stride * f) == 0
                and w % (stride * f) == 0 and kernel >= stride):
            return f
    return 1

# Filter schedules, reference styleTransfer.py:218-223 and :247-256.
CONTRACT_FILTER_SIZES: Tuple[Tuple[int, int, int], ...] = (
    (16, 3, 2),
    (32, 3, 2),
    (32, 3, 2),
    (32, 3, 2),
)
EXPAND_FILTER_SIZES: Tuple[Tuple[int, int, int], ...] = (
    (32, 3, 2),
    (16, 3, 2),
    (8, 3, 2),
    (4, 3, 2),
    (3, 3, 2),
    (3, 3, 2),
    (3, 3, 2),
    (3, 3, 2),
)
NUM_RESIDUAL_BLOCKS = 5
STEM_FILTERS = 32


@dataclasses.dataclass(frozen=True)
class TransferPlan:
    """Static block schedule + the flat style-vector segment layout (the ABI)."""

    input_shape: Tuple[int, int, int]
    output_shape: Tuple[int, int, int]
    bottleneck_res_y: int
    bottleneck_num_filters: int
    num_contract_blocks: int
    num_expand_blocks: int
    # (filters, kernel, stride) per expand block including the final sigmoid block
    expand_blocks: Tuple[Tuple[int, int, int], ...]
    # style params consumed per residual block / per expand block, in slice order
    residual_param_counts: Tuple[int, ...]
    expand_param_counts: Tuple[int, ...]

    @property
    def num_style_parameters(self) -> int:
        return sum(self.residual_param_counts) + sum(self.expand_param_counts)

    @property
    def num_mips(self) -> int:
        return self.num_expand_blocks + 1


def make_transfer_plan(
    input_shape: Sequence[int],
    output_shape: Sequence[int],
    bottleneck_res_y: int,
    bottleneck_num_filters: int,
) -> TransferPlan:
    """Block-count math, reference ``styleTransfer.py:217,258``."""
    num_contract = math.ceil(math.log2(input_shape[0]) - math.log2(bottleneck_res_y))
    num_expand = math.ceil(math.log2(output_shape[0]) - math.log2(bottleneck_res_y))
    expand_blocks = tuple(EXPAND_FILTER_SIZES[i] for i in range(num_expand)) + ((3, 9, 1),)
    # Residual blocks: 2 conv+CIN each -> 2 * 2 * filters params (styleTransfer.py:153-155)
    res_counts = tuple(
        NUM_PARAMS_PER_FEATURE * 2 * bottleneck_num_filters
        for _ in range(NUM_RESIDUAL_BLOCKS)
    )
    exp_counts = tuple(NUM_PARAMS_PER_FEATURE * f for f, _, _ in expand_blocks)
    return TransferPlan(
        input_shape=tuple(input_shape),
        output_shape=tuple(output_shape),
        bottleneck_res_y=bottleneck_res_y,
        bottleneck_num_filters=bottleneck_num_filters,
        num_contract_blocks=num_contract,
        num_expand_blocks=num_expand,
        expand_blocks=expand_blocks,
        residual_param_counts=res_counts,
        expand_param_counts=exp_counts,
    )


def style_param_count(
    input_shape: Sequence[int],
    output_shape: Sequence[int],
    bottleneck_res_y: int,
    bottleneck_num_filters: int,
) -> int:
    """Size of the flat style vector (2662 for rst-960-120-128-*)."""
    return make_transfer_plan(
        input_shape, output_shape, bottleneck_res_y, bottleneck_num_filters
    ).num_style_parameters


class FastConv(nn.Module):
    """Drop-in 'SAME' Conv with output space-to-depth packing for small Cout.

    Same param names/shapes as ``nn.Conv``; routes through ``ops.conv.conv_s2d``
    when the shape qualifies (odd kernel, divisible dims, Cout*f^2 <= 128) — the
    9x9 stem with 32 output channels leaves 3/4 of the MXU lanes idle under the
    direct lowering, the 16-filter contract conv 7/8.
    """

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    kernel_init: nn.initializers.Initializer = nn.initializers.lecun_normal()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kh, kw = self.kernel_size
        stride = self.strides[0]
        kernel = self.param(
            "kernel", self.kernel_init, (kh, kw, x.shape[-1], self.features),
            jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        x = x.astype(self.dtype)
        kernel = kernel.astype(self.dtype)
        factor = 1
        if kh % 2 and kw % 2 and self.strides[0] == self.strides[1]:
            factor = _s2d_factor(self.features, stride, min(kh, kw),
                                 x.shape[1], x.shape[2])
        if factor > 1:
            y = conv_s2d(x, kernel, stride=stride, factor=factor)
        else:
            y = jax.lax.conv_general_dilated(
                x, kernel, self.strides, "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        return (y + bias).astype(self.dtype)


class FastConvTranspose(nn.Module):
    """Drop-in ConvTranspose ('SAME') with an MXU-friendly stride-2 lowering.

    Same param names/shapes as ``nn.ConvTranspose`` (kernel (kh, kw, I, O) + bias),
    so checkpoints are interchangeable; stride-2 calls route through
    ``ops.conv.conv_transpose_2x`` (dense parity-packed conv + depth-to-space)
    instead of XLA's input-dilated conv, which wastes 3/4 of its MXU work on
    structural zeros.
    """

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int]
    kernel_init: nn.initializers.Initializer = nn.initializers.lecun_normal()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kh, kw = self.kernel_size
        kernel = self.param(
            "kernel", self.kernel_init, (kh, kw, x.shape[-1], self.features),
            jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        x = x.astype(self.dtype)
        kernel = kernel.astype(self.dtype)
        kh, kw = self.kernel_size
        s2d = (self.strides == (1, 1) and kh % 2 and kw % 2
               and _s2d_factor(self.features, 1, min(kh, kw),
                               x.shape[1], x.shape[2]) > 1)
        if self.strides == (2, 2):
            y = conv_transpose_2x(x, kernel)
        elif s2d:
            # stride-1 'SAME' transpose conv (odd k) == plain conv; use the
            # space-to-depth lowering (the final 9x9 16->3 layer is 60% of the
            # frame under the direct lowering — 3/128 MXU lanes).
            y = conv_s2d(
                x, kernel, stride=1,
                factor=_s2d_factor(self.features, 1, min(kh, kw),
                                   x.shape[1], x.shape[2]),
            )
        else:
            y = jax.lax.conv_transpose(
                x, kernel, self.strides, "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        return (y + bias).astype(self.dtype)


class StyleTransferNet(nn.Module):
    """Encoder–decoder stylization net conditioned on a flat style vector.

    Inputs (batched): ``content`` (B, H, W, C_in); ``style_params``
    (B, num_styles, P); optional ``style_weights`` (B, H_out, W_out, num_styles-1).
    Output: (B, H_out, W_out, 3) in [0, 1], f32.
    """

    plan: TransferPlan
    num_styles: int = 1
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False
    cin_epsilon: float = 1e-5

    @nn.compact
    def __call__(
        self,
        content: jnp.ndarray,
        style_params: jnp.ndarray,
        style_weights: Optional[jnp.ndarray] = None,
        *,
        train: bool = False,
    ) -> jnp.ndarray:
        plan = self.plan
        if style_params.shape[-1] != plan.num_style_parameters:
            raise ValueError(
                f"style_params last dim {style_params.shape[-1]} != plan "
                f"{plan.num_style_parameters}"
            )

        conv_init = nn.initializers.normal(stddev=0.02)  # styleTransfer.py:97,190
        res_init = nn.initializers.uniform(scale=0.05)  # styleTransfer.py:146

        mips = None
        if self.num_styles > 1:
            if style_weights is None:
                raise ValueError("style_weights required when num_styles > 1")
            weights_full = concat_implicit_weight(style_weights.astype(jnp.float32))
            mips = style_weight_mips(weights_full, plan.num_mips)

        x = content.astype(self.dtype)

        # ---- contract stack (stem + strided blocks), styleTransfer.py:224-232 ----
        contract_schedule = [(STEM_FILTERS, 9, 1)] + [
            CONTRACT_FILTER_SIZES[i] for i in range(plan.num_contract_blocks)
        ]
        for bi, (filters, kernel, stride) in enumerate(contract_schedule):
            x = FastConv(
                features=filters,
                kernel_size=(kernel, kernel),
                strides=(stride, stride),
                kernel_init=conv_init,
                dtype=self.dtype,
                name=f"contract_{bi}_conv",
            )(x)
            x = nn.relu(x)
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.99,
                epsilon=1e-3,
                dtype=self.dtype,
                name=f"contract_{bi}_bn",
            )(x)
            x = nn.relu(x)

        # ---- style parameter cursor over the flat vector ----
        # (B, S, P) -> (B, 1, S, P), matching reference styleTransfer.py:305.
        cursor = StyleParamCursor(style_params[:, None, :, :].astype(jnp.float32))

        def pick_mip(width: int):
            if mips is None:
                return None
            return mips[width]

        # ---- residual core, styleTransfer.py:144-185,239-245 ----
        filters = plan.bottleneck_num_filters
        for ri in range(NUM_RESIDUAL_BLOCKS):
            block_weights = pick_mip(x.shape[-2])
            fx = x
            for ci in range(2):
                fx = nn.Conv(
                    filters,
                    (3, 3),
                    strides=(1, 1),
                    padding="SAME",
                    kernel_init=res_init,
                    dtype=self.dtype,
                    name=f"residual_{ri}_conv{ci}",
                )(fx)
                fx = nn.relu(fx)
                fx = cin_from_cursor(
                    fx,
                    cursor,
                    block_weights,
                    epsilon=self.cin_epsilon,
                    use_pallas=self.use_pallas,
                )
                if ci == 0:  # no activation after the last conv+CIN
                    fx = nn.relu(fx)
            x = fx if ri == 0 else x + fx  # block 0 changes channel count: no skip

        # ---- expand stack, styleTransfer.py:95-141,260-276 ----
        num_blocks = len(plan.expand_blocks)
        for ei, (filters, kernel, stride) in enumerate(plan.expand_blocks):
            is_last = ei == num_blocks - 1
            block_weights = pick_mip(x.shape[-2] * stride)
            x = FastConvTranspose(
                features=filters,
                kernel_size=(kernel, kernel),
                strides=(stride, stride),
                kernel_init=conv_init,
                dtype=self.dtype,
                name=f"expand_{ei}_conv",
            )(x)
            x = cin_from_cursor(
                x,
                cursor,
                block_weights,
                epsilon=self.cin_epsilon,
                use_pallas=self.use_pallas,
            )
            x = nn.sigmoid(x) if is_last else nn.relu(x)

        cursor.assert_consumed()
        return x.astype(jnp.float32)
