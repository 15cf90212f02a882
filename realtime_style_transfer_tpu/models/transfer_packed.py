"""Packed-layout inference path for the transfer net (deploy-only).

Identical math to ``StyleTransferNet`` (same variables pytree!) but every
activation outside the residual core stays in space-to-depth layout, so all
convs feed the MXU with >=64 dense channels and no per-layer depth-to-space
shuffles.  The schedule is derived from the ``TransferPlan`` (it is NOT limited
to the flagship 2-contract/2-expand family):

    content (B,H,W,C)        -> pack f2            (B,H/2,W/2,4C)
    stem 9x9 s1              fin2 -> fout2
    contract 3x3 s2 (xC-1)   fin2 -> fout2         packed dims halve each block
    last contract 3x3 s2     fin2 -> fout1         bottleneck, dense
    res core (5 blocks)      dense                 (already MXU-shaped)
    expand convT2x (i=0..E)  fin 2^i -> fout 2^(i+1)   spatial dims stay put
    final 9x9 s1             fin 2^E -> fout 2^E
    unpack 2^E + sigmoid     -> (B, H, W, 3)

BatchNorm runs in inference form (affine folded from batch_stats); CIN computes
per-logical-channel moments across the packed parity groups.  Multi-style
blending is supported: the style-weight mip pyramid is built in the logical
domain (reference ``styleTransfer.py:288-303,335-345``), blended affine maps are
packed alongside the activations.  Exact equivalence with
``StyleTransferNet.apply`` across plan shapes and dual-style is asserted by
``tests/test_packed_conv.py``.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..ops.image_ops import style_weight_mips
from ..ops.packed_conv import pack, packed_conv, packed_conv_transpose_2x, unpack
from ..ops.style_params import StyleParamCursor, concat_implicit_weight
from ..ops.normalization import conditional_instance_norm
from .transfer import (
    CONTRACT_FILTER_SIZES,
    NUM_RESIDUAL_BLOCKS,
    STEM_FILTERS,
    TransferPlan,
)

BN_EPS = 1e-3


def _bn_affine(params_bn, stats_bn):
    inv = jax.lax.rsqrt(stats_bn["var"].astype(jnp.float32) + BN_EPS)
    eff_scale = params_bn["scale"].astype(jnp.float32) * inv
    eff_bias = (params_bn["bias"].astype(jnp.float32)
                - stats_bn["mean"].astype(jnp.float32) * eff_scale)
    return eff_scale, eff_bias


def _packed_affine_relu(p, eff_scale, eff_bias, f, dtype):
    scale = jnp.tile(eff_scale, f * f).astype(dtype)
    bias = jnp.tile(eff_bias, f * f).astype(dtype)
    return jax.nn.relu(p * scale + bias)


def _packed_cin(p, scale, bias, f: int, c: int, *, epsilon: float, dtype):
    """CIN on a packed tensor: logical per-channel moments across parity groups.

    ``scale``/``bias`` are either (B, 1, 1, C) broadcasting slices from the
    style-param cursor (single style) or packed per-pixel maps
    (B, Hp, Wp, f*f*C) after two-style blending.
    """
    b, hp, wp, _ = p.shape
    x = p.astype(jnp.float32).reshape(b, hp, wp, f * f, c)
    mean = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
    var = jnp.mean(jnp.square(x), axis=(1, 2, 3), keepdims=True) - jnp.square(mean)
    inv = jax.lax.rsqrt(var + jnp.float32(epsilon))

    def fit(m):
        m = m.astype(jnp.float32)
        if m.ndim == 4 and m.shape[1] == 1 and m.shape[2] == 1:
            return m.reshape(b, 1, 1, 1, c)
        return m.reshape(b, hp, wp, f * f, c)

    out = fit(bias) + (x - mean) * inv * fit(scale)
    return out.reshape(b, hp, wp, f * f * c).astype(dtype)


def _take_affine(cursor: StyleParamCursor, mip, channels: int):
    """Next (scale, bias) slices, blended to per-pixel maps when dual-style.

    Matches ``ops.normalization.cin_from_cursor`` slice order (scale, bias) and
    the reference's exactly-two-styles blend rule (``styleTransfer.py:36-44``).
    """
    from ..ops.style_params import apply_style_weights

    scale = apply_style_weights(mip, cursor.take(channels))
    bias = apply_style_weights(mip, cursor.take(channels))
    if scale.ndim == 4 and mip is not None and scale.shape[1] == mip.shape[1]:
        return scale, bias  # blended (B, H, W, C) logical maps
    # single style / pass-through: (B, 1, S, C) -> (B, 1, 1, C)
    return (scale.reshape(scale.shape[0], 1, 1, channels),
            bias.reshape(bias.shape[0], 1, 1, channels))


def stylize_packed(
    variables,
    content: jnp.ndarray,
    style_params: jnp.ndarray,
    style_weights: Optional[jnp.ndarray] = None,
    *,
    plan: TransferPlan,
    dtype=jnp.bfloat16,
    cin_epsilon: float = 1e-5,
    conv_backend: str = "auto",
) -> jnp.ndarray:
    """Packed-layout equivalent of ``StyleTransferNet.__call__``.

    ``style_params``: (B, S, P); ``style_weights``: (B, H, W, S-1) when S == 2.
    ``conv_backend``: 'xla' (default), or 'pallas' (r1 tap-matmul kernels for the
    stride-1 seams; measured FASTER standalone but SLOWER in-net — kept for
    standalone use; the production Pallas path is the fused whole-net kernel).
    """
    if conv_backend == "auto":
        conv_backend = "xla"
    if plan.num_contract_blocks < 1:
        raise ValueError("packed path needs >=1 contract block (fin=2 stem)")
    num_styles = style_params.shape[1]
    params = variables["params"]
    stats = variables["batch_stats"]
    # accept either the full inference model's variables or the bare transfer net's
    transfer_p = params.get("transfer", params)
    transfer_s = stats.get("transfer", stats)

    def conv_params(name):
        return (transfer_p[name]["kernel"].astype(dtype),
                transfer_p[name]["bias"].astype(dtype))

    cursor = StyleParamCursor(style_params[:, None, :, :].astype(jnp.float32))

    mips = None
    if num_styles > 1:
        if style_weights is None:
            raise ValueError("style_weights required when num_styles > 1")
        weights_full = concat_implicit_weight(style_weights.astype(jnp.float32))
        mips = style_weight_mips(weights_full, plan.num_mips)

    def pick_mip(logical_width: int):
        return None if mips is None else mips[logical_width]

    x = pack(content.astype(dtype), 2)

    # ---- contract stack: stem f2f2, middles f2f2 s2, last f2f1 s2 ------------
    schedule = [("contract_0_conv", "contract_0_bn", 1, 2, 2, STEM_FILTERS)]
    for ci in range(plan.num_contract_blocks):
        last = ci == plan.num_contract_blocks - 1
        cout = CONTRACT_FILTER_SIZES[ci][0]
        schedule.append(
            (f"contract_{ci + 1}_conv", f"contract_{ci + 1}_bn", 2, 2,
             1 if last else 2, cout)
        )
    for conv_name, bn_name, stride, fin, fout, cout in schedule:
        kernel, bias = conv_params(conv_name)
        eff_scale, eff_bias = _bn_affine(transfer_p[bn_name], transfer_s[bn_name])
        if conv_backend == "pallas" and stride == 1 and fin == fout:
            from ..ops.packed_conv import packed_conv_fused_contract

            x = packed_conv_fused_contract(
                x, kernel, bias, eff_scale, eff_bias, fin=fin, fout=fout
            )
        else:
            x = packed_conv(x, kernel, stride=stride, fin=fin, fout=fout,
                            backend="xla")
            x = x + jnp.tile(bias, fout * fout)
            x = jax.nn.relu(x)
            x = _packed_affine_relu(x, eff_scale, eff_bias, fout, dtype)

    # ---- residual core (dense; identical to the standard path) ---------------
    filters = plan.bottleneck_num_filters
    res_mip = pick_mip(x.shape[-2])
    for ri in range(NUM_RESIDUAL_BLOCKS):
        fx = x
        for ci in range(2):
            kernel, bias = conv_params(f"residual_{ri}_conv{ci}")
            fx = jax.lax.conv_general_dilated(
                fx, kernel, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + bias
            fx = jax.nn.relu(fx)
            scale, bias_c = _take_affine(cursor, res_mip, filters)
            fx = conditional_instance_norm(
                fx, scale, bias_c, epsilon=cin_epsilon
            ).astype(dtype)
            if ci == 0:
                fx = jax.nn.relu(fx)
        x = fx if ri == 0 else x + fx

    # ---- expand stack: convT2x at growing pack factors, then final s1 --------
    hp, wp = x.shape[1], x.shape[2]
    for ei in range(plan.num_expand_blocks):
        filters_e = plan.expand_blocks[ei][0]
        fin, fout = 2 ** ei, 2 ** (ei + 1)
        kernel, bias = conv_params(f"expand_{ei}_conv")
        x = packed_conv_transpose_2x(x, kernel, fin=fin, fout=fout)
        x = x + jnp.tile(bias, fout * fout)
        scale, bias_c = _take_affine(cursor, pick_mip(wp * fout), filters_e)
        if scale.ndim == 4 and scale.shape[1] > 1:  # blended logical maps
            scale = pack(scale, fout)
            bias_c = pack(bias_c, fout)
        x = jax.nn.relu(_packed_cin(
            x, scale, bias_c, fout, filters_e, epsilon=cin_epsilon, dtype=dtype,
        ))

    f_final = 2 ** plan.num_expand_blocks
    fin_filters = plan.expand_blocks[-1][0]
    kernel, bias = conv_params(f"expand_{plan.num_expand_blocks}_conv")
    x = packed_conv(x, kernel, stride=1, fin=f_final, fout=f_final,
                    backend=conv_backend)
    x = x + jnp.tile(bias, f_final * f_final)
    scale, bias_c = _take_affine(cursor, pick_mip(wp * f_final), fin_filters)
    if scale.ndim == 4 and scale.shape[1] > 1:
        scale = pack(scale, f_final)
        bias_c = pack(bias_c, f_final)
    x = _packed_cin(
        x, scale, bias_c, f_final, fin_filters, epsilon=cin_epsilon, dtype=dtype,
    )
    x = jax.nn.sigmoid(x)

    cursor.assert_consumed()
    return unpack(x, f_final, fin_filters).astype(jnp.float32)
