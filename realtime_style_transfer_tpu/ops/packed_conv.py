"""Packed-domain convolutions: conv/conv-transpose on space-to-depth tensors.

The s2d output-packing in ``ops.conv`` fixes MXU lane waste on the OUTPUT side,
but every conv still reads its input in logical layout (e.g. the 9x9 stem feeds
C=17 of 128 lanes).  Here the activation never leaves packed layout: a tensor of
logical shape (B, H, W, C) is carried as (B, H/f, W/f, f*f*C) with channel order
(dy, dx, c), and each layer's kernel is assembled so the convolution maps
packed -> packed directly.

Index math (per axis; logical SAME conv, stride s, odd k, dims divisible):
  logical out row  m = fout*a + dy
  logical in rows  s*m + t - pb,  t in [0,k),  pb = (k - s)//2
  packed in row r holds logical row fin*r + ey
so tap t contributes iff  (s*dy + t - pb - ey) % fin == 0, at packed offset
  off = (s*dy + t - pb - ey) / fin
relative to packed stride S = s*fout/fin (must be integer).  All (dy, ey) classes
share one window [LO, HI]; the assembled kernel has extent HI-LO+1 and channel
blocks (ey,ex,cin) -> (dy,dx,cout).

Transpose convs (stride 2) decompose into per-output-parity s1 convs (see
``ops.conv.pack_transpose_kernel``), which then go through the same machinery
with the output parity folded into fout.

Exactness for every seam is asserted in ``tests/test_packed_conv.py`` against the
logical lax ops.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def pack(x: jnp.ndarray, f: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H/f, W/f, f*f*C), channel order (dy, dx, c)."""
    if f == 1:
        return x
    b, h, w, c = x.shape
    x = x.reshape(b, h // f, f, w // f, f, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // f, w // f, f * f * c)


def unpack(p: jnp.ndarray, f: int, c: int) -> jnp.ndarray:
    """Inverse of :func:`pack`."""
    if f == 1:
        return p
    b, hh, ww, _ = p.shape
    x = p.reshape(b, hh, ww, f, f, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hh * f, ww * f, c)


def _axis_plan(k: int, s: int, fin: int, fout: int):
    """Tap placement for one axis: returns (offsets dict, LO, extent, S).

    offsets[(dy, ey)] = list of (packed_offset, tap_index) pairs.
    """
    if (s * fout) % fin:
        raise ValueError(f"packed stride s*fout/fin not integral: {s}*{fout}/{fin}")
    pb = (k - s) // 2
    if pb < 0:
        raise ValueError("kernel smaller than stride")
    offsets = {}
    lo, hi = 10**9, -(10**9)
    for dy in range(fout):
        for ey in range(fin):
            pairs = []
            for t in range(k):
                num = s * dy + t - pb - ey
                if num % fin:
                    continue
                off = num // fin
                pairs.append((off, t))
                lo, hi = min(lo, off), max(hi, off)
            offsets[(dy, ey)] = pairs
    return offsets, lo, hi - lo + 1, (s * fout) // fin


def packed_conv_kernel(kernel: jnp.ndarray, *, stride: int, fin: int,
                       fout: int) -> Tuple[jnp.ndarray, Tuple, Tuple, int]:
    """Assemble the packed-domain kernel for a logical SAME conv.

    Returns ``(packed_kernel (Ph, Pw, fin^2*Cin, fout^2*Cout), pad_y, pad_x, S)``
    where ``S`` is the packed-space stride and pads apply to the packed input.
    """
    kh, kw, cin, cout = kernel.shape
    offs_y, lo_y, ph, s_y = _axis_plan(kh, stride, fin, fout)
    offs_x, lo_x, pw, s_x = _axis_plan(kw, stride, fin, fout)

    packed = jnp.zeros((ph, pw, fin * fin * cin, fout * fout * cout),
                       kernel.dtype)
    for dy in range(fout):
        for dx in range(fout):
            out_block = (dy * fout + dx) * cout
            for ey in range(fin):
                for ex in range(fin):
                    in_block = (ey * fin + ex) * cin
                    for off_y, ty in offs_y[(dy, ey)]:
                        for off_x, tx in offs_x[(dx, ex)]:
                            packed = packed.at[
                                off_y - lo_y, off_x - lo_x,
                                in_block:in_block + cin,
                                out_block:out_block + cout,
                            ].set(kernel[ty, tx])
    return packed, (lo_y, ph), (lo_x, pw), s_y


def _pads(lo: int, extent: int, s_packed: int, hp_in: int, hp_out: int):
    before = max(0, -lo)
    last_read = s_packed * (hp_out - 1) + lo + extent - 1
    after = max(0, last_read - (hp_in - 1))
    return before, after


def packed_conv(p: jnp.ndarray, kernel: jnp.ndarray, *, stride: int, fin: int,
                fout: int, backend: str = "xla") -> jnp.ndarray:
    """Logical SAME conv applied to a packed tensor, producing a packed tensor.

    ``p``: (B, Hl/fin, Wl/fin, fin^2*Cin); result: (B, Ho/fout, Wo/fout,
    fout^2*Cout) where Ho = Hl/stride.  ``backend='pallas'`` routes packed-
    stride-1 cases through the tap-matmul Pallas kernel (measured ~18% faster
    than the XLA conv on the stem shapes); other cases fall back to XLA.
    """
    b, hp, wp, _ = p.shape
    h_logical = hp * fin
    h_out = h_logical // stride
    hp_out = h_out // fout
    w_logical = wp * fin
    wp_out = (w_logical // stride) // fout

    pk, (lo_y, ph), (lo_x, pw), s_packed = packed_conv_kernel(
        kernel, stride=stride, fin=fin, fout=fout
    )
    pb_y, pa_y = _pads(lo_y, ph, s_packed, hp, hp_out)
    pb_x, pa_x = _pads(lo_x, pw, s_packed, wp, wp_out)
    pp = jnp.pad(p, ((0, 0), (pb_y, pa_y), (pb_x, pa_x), (0, 0)))
    if backend == "pallas" and s_packed == 1 and hp_out % 2 == 0:
        from .pallas.conv_matmul import conv_valid_matmul

        out = jnp.stack([conv_valid_matmul(pp[i], pk) for i in range(b)])
    else:
        out = jax.lax.conv_general_dilated(
            pp, pk, (s_packed, s_packed), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
    return out[:, :hp_out, :wp_out, :]


def packed_conv_fused_contract(p: jnp.ndarray, kernel: jnp.ndarray,
                               bias: jnp.ndarray, scale: jnp.ndarray,
                               shift: jnp.ndarray, *, fin: int,
                               fout: int) -> jnp.ndarray:
    """Stride-1 packed conv with the contract-block tail fused in the Pallas
    kernel: ``relu(relu(conv + bias) * scale + shift)``.

    ``bias``/``scale``/``shift`` are per LOGICAL output channel; tiling across
    the fout^2 parity groups happens here.  TPU backends only.
    """
    from .pallas.conv_matmul import conv_valid_matmul

    b, hp, wp, _ = p.shape
    hp_out, wp_out = hp * fin // fout, wp * fin // fout
    pk, (lo_y, ph), (lo_x, pw), s_packed = packed_conv_kernel(
        kernel, stride=1, fin=fin, fout=fout
    )
    if s_packed != 1:
        raise ValueError("fused contract path requires packed stride 1")
    pb_y, pa_y = _pads(lo_y, ph, 1, hp, hp_out)
    pb_x, pa_x = _pads(lo_x, pw, 1, wp, wp_out)
    pp = jnp.pad(p, ((0, 0), (pb_y, pa_y), (pb_x, pa_x), (0, 0)))
    ff = fout * fout
    out = jnp.stack([
        conv_valid_matmul(
            pp[i], pk,
            bias=jnp.tile(bias, ff), scale=jnp.tile(scale, ff),
            shift=jnp.tile(shift, ff), epilogue="contract",
        )
        for i in range(b)
    ])
    return out[:, :hp_out, :wp_out, :]


def packed_conv_transpose_kernel(
    kernel: jnp.ndarray, *, fin: int, fout: int
) -> Tuple[jnp.ndarray, Tuple, Tuple, int]:
    """Assemble the packed-domain kernel for a logical stride-2 'SAME'
    TRANSPOSE conv, with the output-parity reorder folded into the kernel's
    output channels.

    Returns ``(packed_kernel, (lo_y, ph), (lo_x, pw), s_packed)`` exactly like
    :func:`packed_conv_kernel`, so one VALID conv with those pads maps a
    fin-packed tensor directly to ``pack(conv_transpose(x), fout)``.  Requires
    ``fout % 2 == 0`` (the transpose's own 2x is the inner output parity).
    """
    if fout % 2:
        raise ValueError("fout must be a multiple of 2 for a 2x transpose conv")
    kh, kw, cin, cout = kernel.shape
    fo = fout // 2  # extra packing applied on top of the transpose parity

    # Per-axis transpose classes: d -> (taps, window start offset), from
    # ops.conv._axis_classes (pad_lo = k//2 + 1).
    from .conv import _axis_classes

    cls_y = _axis_classes(kh)
    cls_x = _axis_classes(kw)

    # Each class (d_y, d_x) is an s1 conv with kernel K_cls[j_y, j_x] =
    # kernel[taps_y[j_y], taps_x[j_x]] whose logical input window starts at
    # offset (o_y, o_x). Build one merged logical kernel over the union window
    # with per-class channel blocks, then assemble the packed kernel with
    # stride=1 / fout=fo.
    len_y = [len(t) for t, _ in cls_y]
    len_x = [len(t) for t, _ in cls_x]
    o_y = [s for _, s in cls_y]
    o_x = [s for _, s in cls_x]
    lo_y, hi_y = min(o_y), max(o_y[d] + len_y[d] - 1 for d in range(2))
    lo_x, hi_x = min(o_x), max(o_x[d] + len_x[d] - 1 for d in range(2))
    ext_y, ext_x = hi_y - lo_y + 1, hi_x - lo_x + 1
    # logical merged kernel must be odd-sized and aligned so that SAME padding
    # pb = (k'-1)//2 equals -lo (window starts at i + lo): choose k' odd with
    # pb = -lo_*; pad extent with zero taps if needed.
    kk_y = max(ext_y, 2 * (-lo_y) + 1)
    kk_x = max(ext_x, 2 * (-lo_x) + 1)
    if kk_y % 2 == 0:
        kk_y += 1
    if kk_x % 2 == 0:
        kk_x += 1
    pb_y, pb_x = (kk_y - 1) // 2, (kk_x - 1) // 2

    merged = jnp.zeros((kk_y, kk_x, cin, 4 * cout), kernel.dtype)
    for dy in range(2):
        taps_y, start_y = cls_y[dy]
        for dx in range(2):
            taps_x, start_x = cls_x[dx]
            if not taps_y or not taps_x:
                continue
            sub = kernel[taps_y[0]::2, taps_x[0]::2]
            cls = dy * 2 + dx
            py = start_y + pb_y
            px = start_x + pb_x
            merged = merged.at[
                py:py + len(taps_y), px:px + len(taps_x), :,
                cls * cout:(cls + 1) * cout,
            ].set(sub)

    pk, pads_y, pads_x, s_packed = packed_conv_kernel(
        merged, stride=1, fin=fin, fout=fo
    )
    # packed_conv output channels are (gy, gx, (dy, dx), c); the true packed
    # layout for factor fout = 2*fo is (gy, dy, gx, dx, c).  Fold that
    # permutation into the kernel's output-channel axis.
    perm = np.empty(fout * fout * cout, np.int64)
    for gy in range(fo):
        for gx in range(fo):
            for dy in range(2):
                for dx in range(2):
                    src = ((gy * fo + gx) * 4 + dy * 2 + dx) * cout
                    dst = ((((gy * 2 + dy) * fo + gx) * 2) + dx) * cout
                    perm[dst:dst + cout] = np.arange(src, src + cout)
    return pk[..., perm], pads_y, pads_x, s_packed


def packed_conv_transpose_2x(p: jnp.ndarray, kernel: jnp.ndarray, *,
                             fin: int, fout: int) -> jnp.ndarray:
    """Stride-2 'SAME' transpose conv on packed tensors.

    Decomposes into the 4 output-parity s1 convs (see
    :func:`packed_conv_transpose_kernel`) and runs the single assembled VALID
    conv.
    """
    b, hp, wp, _ = p.shape
    pk, (lo_y, ph), (lo_x, pw), s_packed = packed_conv_transpose_kernel(
        kernel, fin=fin, fout=fout
    )
    hp_out, wp_out = hp * fin * 2 // fout, wp * fin * 2 // fout
    pb_y, pa_y = _pads(lo_y, ph, s_packed, hp, hp_out)
    pb_x, pa_x = _pads(lo_x, pw, s_packed, wp, wp_out)
    pp = jnp.pad(p, ((0, 0), (pb_y, pa_y), (pb_x, pa_x), (0, 0)))
    out = jax.lax.conv_general_dilated(
        pp, pk, (s_packed, s_packed), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out[:, :hp_out, :wp_out, :]
