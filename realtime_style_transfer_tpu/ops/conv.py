"""Convolution helpers: MXU-friendly transpose convolution.

``jax.lax.conv_transpose`` lowers stride-2 transpose convs to input-dilated
convolutions, so the TPU spends most of its MXU work multiplying structural zeros
(3/4 of the dilated grid).  ``conv_transpose_2x`` computes the IDENTICAL result as
one dense stride-1 convolution with a parity-packed kernel plus depth-to-space.

Derivation (per axis, odd k, stride 2, SAME — output m = 2i + d, d in {0,1}):
with pad_lo = k//2 + 1 the dilated conv reads cell (2i + d - pad_lo + t) for tap t;
only even cells hit real pixels, so class d uses taps t = (pad_lo - d) mod 2,
stepping by 2 — a contiguous x-window starting at offset (d - pad_lo + t0) / 2.
(k=3: y[2i] = k[0] x[i-1] + k[2] x[i]; y[2i+1] = k[1] x[i].)
Packing the 4 (dy, dx) classes as extra output channels yields a dense
(T, T, I, 4*O) conv (T = (k+1)//2) with zero wasted FLOPs and 4x the output
channels feeding the MXU lanes.  ``tests/test_conv.py`` asserts exact equivalence
with ``lax.conv_transpose`` for k in {3, 5, 9}.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def _axis_classes(k: int):
    """Per parity class d: (tap_indices, window_start_offset).

    ``pad_lo = k//2 + 1`` matches lax.conv_transpose's SAME placement for odd k
    (verified empirically with delta inputs for k in {3, 5, 9}).
    """
    pad_lo = k // 2 + 1
    out = []
    for d in range(2):
        first = (pad_lo - d) % 2
        taps = list(range(first, k, 2))
        if not taps:
            out.append(([], 0))
            continue
        start = (d - pad_lo + taps[0]) // 2
        out.append((taps, start))
    return out


def pack_transpose_kernel(kernel: jnp.ndarray):
    """(kh, kw, I, O) -> packed (T_h, T_w, I, 4*O) kernel + padding config.

    Returns ``(packed, (pad_y, pad_x))`` for use by :func:`conv_transpose_2x`.
    """
    kh, kw, cin, cout = kernel.shape
    if kh % 2 == 0 or kw % 2 == 0:
        raise ValueError("pack_transpose_kernel expects odd kernel sizes")
    cls_y = _axis_classes(kh)
    cls_x = _axis_classes(kw)
    t_h = max(len(t) for t, _ in cls_y)
    t_w = max(len(t) for t, _ in cls_x)
    o_y = min(s for _, s in cls_y)
    o_x = min(s for _, s in cls_x)

    packed = jnp.zeros((t_h, t_w, cin, 4 * cout), kernel.dtype)
    for dy, (taps_y, sy) in enumerate(cls_y):
        for dx, (taps_x, sx) in enumerate(cls_x):
            if not taps_y or not taps_x:
                continue
            # taps are strided ranges -> static slices (export-safe, no gather)
            sub = kernel[taps_y[0]::2, taps_x[0]::2]
            cls = dy * 2 + dx
            py, px = sy - o_y, sx - o_x
            packed = packed.at[
                py:py + len(taps_y), px:px + len(taps_x), :,
                cls * cout:(cls + 1) * cout,
            ].set(sub)

    def axis_pad(origin, t_count) -> Tuple[int, int]:
        # unified window reads x[i + origin .. i + origin + t_count - 1]
        return (max(0, -origin), max(0, origin + t_count - 1))

    pad_y = axis_pad(o_y, t_h)
    pad_x = axis_pad(o_x, t_w)
    return packed, (pad_y, pad_x)


def conv_s2d(x: jnp.ndarray, kernel: jnp.ndarray, *, stride: int = 1,
             factor: int = 2,
             preferred_element_type=None) -> jnp.ndarray:
    """'SAME' conv (NHWC, HWIO, odd k >= stride) via output space-to-depth.

    Tiny output-channel convs (the 9x9 stem 17->32, the final 9x9 16->3, the
    strided 3x3 contract convs with 16-32 filters) leave almost all MXU lanes
    idle.  This computes the IDENTICAL result as a stride ``stride*factor``
    convolution producing the ``factor^2`` output parity classes as extra
    channels, followed by depth-to-space — ``factor^2`` x the lanes for a modest
    MAC overhead of ``((k + stride*(factor-1)) / k)^2``.

    Derivation: SAME with stride s (dims divisible by s) pads (k-s)//2 before;
    y[f*i + d] = sum_t k[t] xp[s*(f*i + d) + t], so class d's taps sit at offset
    s*d of a common window of K' = k + s*(f-1) taps read with stride s*f.
    """
    b, h, w, _ = x.shape
    kh, kw, cin, cout = kernel.shape
    s, f = stride, factor
    if kh % 2 == 0 or kw % 2 == 0:
        raise ValueError("conv_s2d expects odd kernel sizes")
    if kh < s or kw < s:
        raise ValueError("conv_s2d expects kernel >= stride")
    if h % (s * f) or w % (s * f):
        raise ValueError(f"spatial dims must divide stride*factor={s * f}")
    out_h, out_w = h // s, w // s

    kph, kpw = kh + s * (f - 1), kw + s * (f - 1)
    packed = jnp.zeros((kph, kpw, cin, f * f * cout), kernel.dtype)
    for dy in range(f):
        for dx in range(f):
            cls = dy * f + dx
            packed = packed.at[s * dy:s * dy + kh, s * dx:s * dx + kw, :,
                               cls * cout:(cls + 1) * cout].set(kernel)

    pb_y, pb_x = (kh - s) // 2, (kw - s) // 2
    pa_y = (kh - s) - pb_y + s * (f - 1)
    pa_x = (kw - s) - pb_x + s * (f - 1)
    xp = jnp.pad(x, ((0, 0), (pb_y, pa_y), (pb_x, pa_x), (0, 0)))
    out = jax.lax.conv_general_dilated(
        xp, packed, (s * f, s * f), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=preferred_element_type,
    )
    out = out.reshape(b, out_h // f, out_w // f, f, f, cout)
    out = out.transpose(0, 1, 3, 2, 4, 5)
    return out.reshape(b, out_h, out_w, cout)


def conv_same_s2d(x: jnp.ndarray, kernel: jnp.ndarray, *,
                  preferred_element_type=None) -> jnp.ndarray:
    """Back-compat wrapper: stride-1, factor-2 :func:`conv_s2d`."""
    return conv_s2d(x, kernel, stride=1, factor=2,
                    preferred_element_type=preferred_element_type)


def conv_transpose_2x(x: jnp.ndarray, kernel: jnp.ndarray, *,
                      preferred_element_type=None) -> jnp.ndarray:
    """Stride-2 'SAME' transpose conv (NHWC x, HWIO kernel), dense lowering.

    Exactly matches ``lax.conv_transpose(x, kernel, (2, 2), 'SAME',
    transpose_kernel=False)`` for odd kernels.
    """
    b, h, w, _ = x.shape
    kh, kw, cin, cout = kernel.shape
    packed, (pad_y, pad_x) = pack_transpose_kernel(kernel)
    xp = jnp.pad(x, ((0, 0), pad_y, pad_x, (0, 0)))
    out = jax.lax.conv_general_dilated(
        xp, packed, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=preferred_element_type,
    )
    out = out[:, :h, :w, :]
    out = out.reshape(b, h, w, 2, 2, cout)
    out = out.transpose(0, 1, 3, 2, 4, 5)
    return out.reshape(b, 2 * h, 2 * w, cout)
