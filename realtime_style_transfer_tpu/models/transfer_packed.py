"""Packed-layout inference path for the transfer net (single-style, deploy-only).

Identical math to ``StyleTransferNet`` (same variables pytree!) but every
activation outside the residual core stays in space-to-depth layout, so all convs
feed the MXU with >=64 dense channels and no per-layer depth-to-space shuffles:

    content (B,H,W,C)      -> pack f2          (B,H/2,W/2,4C)
    stem 9x9 s1            fin2 -> fout2       (H/2, W/2, 128)
    contract 3x3 s2        fin2 -> fout2       (H/4, W/4,  64)
    contract 3x3 s2        fin2 -> fout1       bottleneck, dense (H/4, W/4, 32)
    res core (5 blocks)    dense               (unchanged; already MXU-shaped)
    expand convT2x         fin1 -> fout2       (H/4, W/4, 128)
    expand convT2x         fin2 -> fout4       (H/4, W/4, 256)
    final 9x9 s1           fin4 -> fout4       (H/4, W/4, 48)
    unpack f4 + sigmoid    -> (B, H, W, 3)

BatchNorm runs in inference form (affine folded from batch_stats); CIN computes
per-logical-channel moments across the packed parity groups.  Multi-style
weight-map blending is NOT supported here (use the standard path).  Exact
equivalence with ``StyleTransferNet.apply`` is asserted by
``tests/test_packed_conv.py``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.packed_conv import pack, packed_conv, packed_conv_transpose_2x, unpack
from ..ops.style_params import StyleParamCursor
from ..ops.normalization import conditional_instance_norm
from .transfer import NUM_RESIDUAL_BLOCKS, STEM_FILTERS, CONTRACT_FILTER_SIZES, TransferPlan

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

    ``scale``/``bias``: (B, 1, 1, C) slices from the style-param cursor.
    """
    b, hp, wp, _ = p.shape
    x = p.astype(jnp.float32).reshape(b, hp, wp, f * f, c)
    mean = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
    var = jnp.mean(jnp.square(x), axis=(1, 2, 3), keepdims=True) - jnp.square(mean)
    inv = jax.lax.rsqrt(var + jnp.float32(epsilon))
    scale = scale.reshape(b, 1, 1, 1, c).astype(jnp.float32)
    bias = bias.reshape(b, 1, 1, 1, c).astype(jnp.float32)
    out = bias + (x - mean) * inv * scale
    return out.reshape(b, hp, wp, f * f * c).astype(dtype)


def stylize_packed(
    variables,
    content: jnp.ndarray,
    style_params: jnp.ndarray,
    *,
    plan: TransferPlan,
    dtype=jnp.bfloat16,
    cin_epsilon: float = 1e-5,
    conv_backend: str = "auto",
) -> jnp.ndarray:
    """Packed-layout equivalent of ``StyleTransferNet.__call__`` (single style).

    ``conv_backend``: 'xla' (default), or 'pallas' (tap-matmul kernels for the
    stride-1 seams; measured FASTER standalone but SLOWER in-net — the custom
    call breaks XLA's pad/bias/relu fusion: 168 vs 195 FPS flagship. Kept for
    standalone use and as the base for a future fused-epilogue kernel)."""
    if conv_backend == "auto":
        conv_backend = "xla"
    if plan.num_contract_blocks != 2 or plan.num_expand_blocks != 2:
        raise ValueError("packed path implemented for the 2-contract/2-expand "
                         "family (rst-*-120-* class configs)")
    params = variables["params"]
    stats = variables["batch_stats"]
    # accept either the full inference model's variables or the bare transfer net's
    transfer_p = params.get("transfer", params)
    transfer_s = stats.get("transfer", stats)

    def conv_params(name):
        return (transfer_p[name]["kernel"].astype(dtype),
                transfer_p[name]["bias"].astype(dtype))

    cursor = StyleParamCursor(style_params[:, None, :, :].astype(jnp.float32))

    x = pack(content.astype(dtype), 2)

    # ---- contract stack (stem f2->f2, c0 f2->f2 s2, c1 f2->f1 s2) ----
    schedule = [
        ("contract_0_conv", "contract_0_bn", 1, 2, 2, STEM_FILTERS),
        ("contract_1_conv", "contract_1_bn", 2, 2, 2, CONTRACT_FILTER_SIZES[0][0]),
        ("contract_2_conv", "contract_2_bn", 2, 2, 1, CONTRACT_FILTER_SIZES[1][0]),
    ]
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

    # ---- residual core (dense; identical to the standard path) ----
    filters = plan.bottleneck_num_filters
    for ri in range(NUM_RESIDUAL_BLOCKS):
        fx = x
        for ci in range(2):
            kernel, bias = conv_params(f"residual_{ri}_conv{ci}")
            fx = jax.lax.conv_general_dilated(
                fx, kernel, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + bias
            fx = jax.nn.relu(fx)
            scale = cursor.take(filters)
            bias_c = cursor.take(filters)
            fx = conditional_instance_norm(
                fx, scale.reshape(scale.shape[0], 1, 1, filters),
                bias_c.reshape(bias_c.shape[0], 1, 1, filters),
                epsilon=cin_epsilon,
            ).astype(dtype)
            if ci == 0:
                fx = jax.nn.relu(fx)
        x = fx if ri == 0 else x + fx

    # ---- expand stack ----
    (e0_filters, _, _), (e1_filters, _, _), (fin_filters, _, _) = plan.expand_blocks

    kernel, bias = conv_params("expand_0_conv")
    x = packed_conv_transpose_2x(x, kernel, fin=1, fout=2)
    x = x + jnp.tile(bias, 4)
    s = cursor.take(e0_filters)
    bc = cursor.take(e0_filters)
    x = jax.nn.relu(_packed_cin(
        x, s.reshape(s.shape[0], 1, 1, e0_filters),
        bc.reshape(bc.shape[0], 1, 1, e0_filters), 2, e0_filters,
        epsilon=cin_epsilon, dtype=dtype,
    ))

    kernel, bias = conv_params("expand_1_conv")
    x = packed_conv_transpose_2x(x, kernel, fin=2, fout=4)
    x = x + jnp.tile(bias, 16)
    s = cursor.take(e1_filters)
    bc = cursor.take(e1_filters)
    x = jax.nn.relu(_packed_cin(
        x, s.reshape(s.shape[0], 1, 1, e1_filters),
        bc.reshape(bc.shape[0], 1, 1, e1_filters), 4, e1_filters,
        epsilon=cin_epsilon, dtype=dtype,
    ))

    kernel, bias = conv_params("expand_2_conv")
    x = packed_conv(x, kernel, stride=1, fin=4, fout=4, backend=conv_backend)
    x = x + jnp.tile(bias, 16)
    s = cursor.take(fin_filters)
    bc = cursor.take(fin_filters)
    x = _packed_cin(
        x, s.reshape(s.shape[0], 1, 1, fin_filters),
        bc.reshape(bc.shape[0], 1, 1, fin_filters), 4, fin_filters,
        epsilon=cin_epsilon, dtype=dtype,
    )
    x = jax.nn.sigmoid(x)

    cursor.assert_consumed()
    return unpack(x, 4, fin_filters).astype(jnp.float32)
