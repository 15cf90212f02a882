"""Pallas conv-as-tap-matmuls kernel with halo DMA (VALID, stride 1, NHWC).

STATUS: superseded research kernel (kept standalone-tested): faster than the
XLA conv in isolation but slower in-net (ROADMAP "r1 Pallas findings"); the
production Pallas path is the whole-net kernel in ``fused_transfer.py``,
which reuses this kernel's band/halo-DMA and tap-matmul design.

For packed-layout convs the contraction per output pixel is big (e.g. the packed
stem: 5x5x68 -> 128) and XLA's conv scheduling leaves MXU throughput on the
table.  This kernel tiles the output rows, DMAs each input tile PLUS its halo
from HBM into VMEM scratch (double-buffered), and accumulates the kh*kw tap
matmuls with ``jnp.dot`` in f32.

Measured on v5e (packed stem shapes, bf16): ~0.53 ms vs ~0.65 ms for the XLA
conv.  Used opportunistically by ``models.transfer_packed`` when shapes qualify;
exactness asserted in ``tests/test_pallas_conv.py``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# per-tile VMEM budget (input tile + acc + double buffer + matmul temporaries)
# — v5e scoped limit 16MB; 3MB tiles measured 329KB over with the fused epilogue
TILE_BUDGET_BYTES = 2 * 1024 * 1024


def _pick_tile(h: int, wp: int, cin: int, kh: int, itemsize: int) -> int:
    for th in (32, 24, 16, 12, 8, 6, 4, 3, 2, 1):
        if h % th == 0 and (th + kh - 1) * wp * cin * itemsize <= TILE_BUDGET_BYTES:
            return th
    return 1


def _kernel(x_hbm, k_ref, bias_ref, scale_ref, shift_ref, o_ref, scratch, sem,
            *, th, w, kh, kw, cin, cout, num_tiles, epilogue):
    # cin is the LOGICAL channel count; scratch/x carry DMA-aligned padding that
    # the compute slices away (padding channels would double the tap-matmul K).
    i = pl.program_id(0)

    def dma_for(slot, tile):
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(tile * th, th + kh - 1)],
            scratch.at[slot],
            sem.at[slot],
        )

    @pl.when(i == 0)
    def _warm():
        dma_for(0, 0).start()

    slot = i % 2
    next_slot = (i + 1) % 2

    @pl.when(i + 1 < num_tiles)
    def _prefetch():
        dma_for(next_slot, i + 1).start()

    dma_for(slot, i).wait()

    acc = jnp.zeros((th * w, cout), jnp.float32)
    for dy in range(kh):
        for dx in range(kw):
            patch = scratch[slot, dy:dy + th, dx:dx + w, :cin].reshape(
                th * w, cin
            )
            acc += jnp.dot(patch, k_ref[dy, dx],
                           preferred_element_type=jnp.float32)
    if epilogue == "contract":
        # the contract-block tail: +bias -> relu -> BN affine -> relu
        acc = jnp.maximum(acc + bias_ref[0], 0.0)
        acc = jnp.maximum(acc * scale_ref[0] + shift_ref[0], 0.0)
    elif epilogue == "bias":
        acc = acc + bias_ref[0]
    o_ref[...] = acc.reshape(th, w, cout).astype(o_ref.dtype)


def conv_valid_matmul(x: jnp.ndarray, kernel: jnp.ndarray, *,
                      bias: jnp.ndarray = None, scale: jnp.ndarray = None,
                      shift: jnp.ndarray = None,
                      epilogue: str = "none") -> jnp.ndarray:
    """VALID stride-1 conv ((Hp, Wp, Cin) x (kh, kw, Cin, Cout)) via tap matmuls.

    Input is the pre-padded single image (no batch dim); output
    (Hp-kh+1, Wp-kw+1, Cout) in x.dtype.

    ``epilogue='contract'`` fuses the contract-block tail in VMEM
    (``relu(relu(conv + bias) * scale + shift)``) — this is what lets the kernel
    beat XLA in-net, since a bare custom call forfeits XLA's epilogue fusion.
    """
    hp, wp, cin = x.shape
    kh, kw, _, cout = kernel.shape
    zeros = jnp.zeros((1, cout), jnp.float32)
    bias = zeros if bias is None else bias.reshape(1, cout).astype(jnp.float32)
    scale = zeros if scale is None else scale.reshape(1, cout).astype(jnp.float32)
    shift = zeros if shift is None else shift.reshape(1, cout).astype(jnp.float32)
    h, w = hp - kh + 1, wp - kw + 1
    # Mosaic manual-DMA slices need tile-aligned shapes: sublane (W) dim to 8,
    # lane (C) dim to 128. Dead columns/channels are zero and only multiply into
    # zero kernel taps.
    wp_pad = -(-wp // 8) * 8
    cin_pad = -(-cin // 128) * 128
    if wp_pad != wp or cin_pad != cin:
        # pad ONLY the DMA layout; the kernel/compute keep the logical cin
        x = jnp.pad(x, ((0, 0), (0, wp_pad - wp), (0, cin_pad - cin)))
        wp = wp_pad
    cin_dma = x.shape[-1]  # DMA-aligned channel count (>= logical cin)
    th = _pick_tile(h, wp, cin_dma, kh, x.dtype.itemsize)
    num_tiles = h // th

    f = functools.partial(
        _kernel, th=th, w=w, kh=kh, kw=kw, cin=cin, cout=cout,
        num_tiles=num_tiles, epilogue=epilogue,
    )
    param_spec = pl.BlockSpec((1, cout), lambda i: (0, 0),
                              memory_space=pltpu.VMEM)
    return pl.pallas_call(
        f,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # x stays in HBM; manual DMA
            pl.BlockSpec((kh, kw, cin, cout), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            param_spec, param_spec, param_spec,
        ],
        out_specs=pl.BlockSpec((th, w, cout), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h, w, cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, th + kh - 1, wp, cin_dma), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * h * w * kh * kw * cin * cout,
            bytes_accessed=(hp * wp * cin + h * w * cout) * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(x, kernel, bias, scale, shift)


def conv_same_batched(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """SAME stride-1 conv on (B, H, W, Cin) via :func:`conv_valid_matmul`.

    Pads once, vmaps the single-image kernel over the batch.
    """
    kh, kw, _, _ = kernel.shape
    pb_y, pb_x = (kh - 1) // 2, (kw - 1) // 2
    xp = jnp.pad(x, ((0, 0), (pb_y, kh - 1 - pb_y), (pb_x, kw - 1 - pb_x),
                     (0, 0)))
    # static unrolled batch loop: vmap over a manual-DMA pallas_call is not
    # supported; inference batches here are tiny (usually 1)
    return jnp.stack([conv_valid_matmul(xp[i], kernel)
                      for i in range(xp.shape[0])])
