"""The whole packed transfer net as ONE Pallas TPU kernel (deploy/latency path).

r1 finding (ROADMAP "r1 Pallas findings"): single-op Pallas kernels lose in-net
because every custom call breaks XLA's producer/consumer fusion and layout
propagation.  The conclusion was that a profitable kernel must swallow a
multi-layer chain so the boundary cost amortizes — this module is that kernel,
taken to its limit: the ENTIRE inference pipeline of the flagship family
(reference ``styleTransfer.py:213-332``) runs inside one ``pallas_call``.

Key design choice: the content is space-to-depth packed at factor 4, which
makes EVERY convolution stride-1 in packed space on one uniform (H/4, W/4)
grid (stem fin4->fout4, contract1 fin4->fout2, contract2 fin2->fout1 — the
``s*fout/fin`` stride rule of ``ops.packed_conv``; the transposes and the
final 9x9 are stride-1 by construction).  Every stage is then the same band
loop: DMA a row band (+halo) from HBM, apply the previous layer's CIN affine /
relu / residual-skip on the fly, run the tap matmuls on the MXU, fuse the
epilogue (bias / BN-affine / relu), accumulate CIN moments, and DMA the band
out.  Activations ping-pong between two HBM scratch buffers held as kernel
outputs; CIN affines are derived in-kernel from the accumulated moments (with
a group-combine matmul for packed parity groups), so there is exactly ONE
kernel launch per frame and XLA sees a single opaque op.

Correctness: exact-equivalence (bf16 tolerance) with ``stylize_packed`` /
``StyleTransferNet.apply`` is asserted in ``tests/test_fused_transfer.py``
(interpret mode on CPU; the real chip is covered by bench + a TPU parity
check).  Restrictions: batch 1 per call, 2-contract/2-expand plans (the
flagship family).  Other shapes fall back to ``stylize_packed``.

Dual-style (``num_styles=2``, reference ``styleTransfer.py:36-44,288-303``):
the per-pixel blend of CIN parameters is linear, and the moment fold is linear
in (scale, bias), so blending folded per-style affines equals folding blended
parameters: ``a(x,y) = a0 + w(x,y) * (a1 - a0)`` (same for b).  The kernel
keeps base + delta affine rows in scratch.  The bottleneck-resolution weight
mip (one scalar per packed pixel — consumed by 9 res stages + e0) lives in
VMEM for the whole kernel as a compact f32 2D ``(hp, wp)`` plane (~hp*wp*4
bytes; a 3D ``(hp, wp, 1)`` input would be lane-padded to 128 and blow the
16 MB scoped-VMEM cap).  Each band reads an 8-aligned window
(``pl.multiple_of`` — 2D VMEM tiles sublanes, so raw halo offsets like
``i*th-1`` are rejected), ``pltpu.roll``s the dynamic misalignment away and
lane-inserts ``[:, :, None]`` to broadcast against the ``(rows, wp, cin)``
band (the f32 lane-insert relayout lowers; the bf16 one does not — probed
r3).  This removes ~hp*wp*LANE*2 bytes of HBM ring traffic per consumer
stage (~74 MB/frame on the flagship).  The expand-resolution mips (whose
per-pixel value varies across subpixel channel blocks) still stream through
a DMA ring pre-expanded to the consumer stage's packed channel count, as
all four mips did in r2.  Plans with ``hp % 8 != 0`` (where the aligned
window math does not close) fall back to the r2 expanded-ring path for wB.
"""

from __future__ import annotations

import dataclasses
import os
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...models.transfer import (
    CONTRACT_FILTER_SIZES,
    NUM_RESIDUAL_BLOCKS,
    TransferPlan,
)
from ..conv import _axis_classes
from ..packed_conv import _axis_plan

LANE = 128
CIN_EPS = 1e-5
ACT_C = 512  # channel width of the HBM activation ping-pong buffers
STATS_C = 256  # max packed channel count of any CIN layer

# Perf-experiment knobs (ROADMAP findings 11/12: the 16 MB scoped-VMEM limit
# is a compiler default, not hardware — tools/probe_vmem_cap.py compiled and
# ran 116 MB scratch kernels on the v5e).  Defaults are the shipped tuning;
# env overrides let bench sweeps re-probe without code edits.  The r3 band-
# budget sweep (finding 12) measured taller bands monotonically WORSE
# (642 FPS @14 MB -> 618/603/562/567 @21/28/42/56): fewer bands lose more
# double-buffer overlap than they save in per-band DMA issue overhead, so
# the 14/12 MB budgets stay.
_VMEM_CAP_MB = float(os.environ.get("RST_FUSED_VMEM_CAP_MB", 18))
_BUDGET_MB = float(os.environ.get("RST_FUSED_BUDGET_MB", 14))
_BUDGET_DUAL_MB = float(os.environ.get("RST_FUSED_BUDGET_DUAL_MB", 12))
# Direct band-DMA-to-compute-ring (r4, unblocked by finding 12): stages with
# no input transform DMA straight into a double-buffered PADDED compute ring,
# eliminating the staging->temp VPU copy (~96 MB/frame over the five
# no-transform stages of the flagship).  The r3 attempt died on the 16 MB
# scoped-VMEM cliff (finding 9); the probe proved that cliff is compiler
# conservatism, so this re-lands it under the raised cap.
_DIRECT_RING = os.environ.get("RST_FUSED_DIRECT_RING", "1") not in ("0", "")
# Producer-quantized int8 activation edges (r5, quant engines only): where a
# stage's ONLY consumer is a transform-free conv, the producer quantizes its
# f32 epilogue output with the consumer's act_inv row and ships int8 — the
# consumer's per-band quantize pass disappears and the edge's HBM ring
# traffic halves (stem->c1 alone is ~29 MB/frame bf16 on the flagship).
# Default OFF: same-session A/B on the real v5e measured it NEUTRAL within
# tunnel noise (int8 1.211 vs 1.191 ms; reversed-order rerun inverted the
# sign) — the quantize VPU work just moves producer-side and the DMA-byte
# saving is offset by int8 store/tile costs, which pins the int8 engine's
# dilution (probe finding 10's 218-of-394 TOP/s band ceiling) on the int8
# temp-store/slab-move pattern itself, not quantize placement or ring bytes.
_Q_EDGES = os.environ.get("RST_FUSED_Q_EDGES", "0") not in ("0", "")
# Dual-style wB layout A/B (r5, VERDICT task 9): ship the bottleneck weight
# mip PRE-EXPANDED (hp, wp, LANE-padded filters) and VMEM-resident (~7.4 MB
# under the raised cap) instead of the compact f32 plane whose per-band
# roll + lane-insert broadcast the r3 floor analysis priced.
_WB_EXPANDED = os.environ.get("RST_FUSED_WB_EXPANDED", "0") not in ("0", "")
# VMEM-resident stage kernels (r5, VERDICT task 6 A/B): ship every packed
# conv kernel as a VMEM blockspec input (~9 MB bf16 on the flagship) instead
# of per-stage HBM->VMEM copies — prices the per-stage kernel-DMA component
# of the fixed overhead directly.
_K_RESIDENT = os.environ.get("RST_FUSED_K_RESIDENT", "0") not in ("0", "")
# Dual-style expand-resolution weight mips (wE0/wE1/wFin, ~30 MB total on
# the flagship) as VMEM-RESIDENT kernel inputs instead of per-band DMA
# rings.  r3 wrote the ~0.14 ms expand-mip ring traffic off under the 16 MB
# scoped-VMEM assumption (the resident planes were uncompilable); finding 12
# killed that assumption, so this re-lands it under a raised cap (the
# resident inputs charge the same scoped stack — finding 9 bullet 3).
_WMIP_RESIDENT = os.environ.get("RST_FUSED_WMIP_RESIDENT", "1") not in ("0", "")


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


# ---------------------------------------------------------------------------
# int8 deploy-scale provenance (no reference counterpart: guards the
# framework's own PTQ deploy contract — scales are per (checkpoint, style),
# see calibrate_act_scales)
# ---------------------------------------------------------------------------


def scales_fingerprint(variables, style_params, style_weights=None) -> str:
    """Provenance hash of what int8 activation scales were calibrated against.

    The scales are maxima of post-CIN-affine activations, so they are a
    function of (transfer weights, style params[, dual weight map]).  A
    scales file deployed against a different (checkpoint, style) pair can
    saturate the ±127 clip and silently degrade output — fingerprinting the
    pair lets the deploy CLI refuse the mismatch instead.
    """
    import hashlib

    h = hashlib.sha256()
    leaves, treedef = jax.tree_util.tree_flatten(jax.device_get(variables))
    h.update(str(treedef).encode())
    for leaf in leaves:
        a = np.asarray(leaf)
        h.update(str((a.shape, str(a.dtype))).encode())
        h.update(np.ascontiguousarray(a).tobytes())
    h.update(np.asarray(jax.device_get(style_params), np.float32).tobytes())
    if style_weights is not None:
        h.update(np.asarray(
            jax.device_get(style_weights), np.float32).tobytes())
    return h.hexdigest()


def save_act_scales(path, scales, fingerprint: Optional[str] = None) -> None:
    """Write an int8 scales file (.npz with provenance fingerprint).

    Writes through an open handle so the exact path is honored (np.savez
    would otherwise append ``.npz`` to e.g. a ``--scales_out foo.npy``).
    """
    with open(path, "wb") as f:
        np.savez(f, scales=np.asarray(scales, np.float32),
                 fingerprint=np.asarray(fingerprint or ""))


def load_act_scales(path):
    """Read a scales file -> (scales, fingerprint-or-None).

    Accepts the fingerprinted .npz format and the legacy bare .npy
    (fingerprint None — callers should treat unfingerprinted scales as
    unverified and run :meth:`FusedTransfer.check_act_saturation`).
    """
    data = np.load(path, allow_pickle=False)
    if hasattr(data, "files"):  # npz
        scales = np.asarray(data["scales"], np.float32)
        fp = str(data["fingerprint"]) if "fingerprint" in data.files else ""
        return scales, (fp or None)
    return np.asarray(data, np.float32), None


# ---------------------------------------------------------------------------
# Host-side packed-kernel assembly (numpy twins of ops.packed_conv — those run
# under jit on traced values; weight prep here is one-time concrete numpy).
# ---------------------------------------------------------------------------


def _np_packed_kernel(kernel: np.ndarray, *, stride: int, fin: int, fout: int):
    """numpy ``ops.packed_conv.packed_conv_kernel`` (equality unit-tested)."""
    kh, kw, cin, cout = kernel.shape
    offs_y, lo_y, ph, s_y = _axis_plan(kh, stride, fin, fout)
    offs_x, lo_x, pw, _ = _axis_plan(kw, stride, fin, fout)
    packed = np.zeros((ph, pw, fin * fin * cin, fout * fout * cout),
                      kernel.dtype)
    for dy in range(fout):
        for dx in range(fout):
            ob = (dy * fout + dx) * cout
            for ey in range(fin):
                for ex in range(fin):
                    ib = (ey * fin + ex) * cin
                    for off_y, ty in offs_y[(dy, ey)]:
                        for off_x, tx in offs_x[(dx, ex)]:
                            packed[off_y - lo_y, off_x - lo_x,
                                   ib:ib + cin, ob:ob + cout] = kernel[ty, tx]
    return packed, (lo_y, ph), (lo_x, pw), s_y


def _np_transpose_kernel(kernel: np.ndarray, *, fin: int, fout: int):
    """numpy ``ops.packed_conv.packed_conv_transpose_kernel``."""
    kh, kw, cin, cout = kernel.shape
    fo = fout // 2
    cls_y = _axis_classes(kh)
    cls_x = _axis_classes(kw)
    len_y = [len(t) for t, _ in cls_y]
    len_x = [len(t) for t, _ in cls_x]
    o_y = [s for _, s in cls_y]
    o_x = [s for _, s in cls_x]
    lo_y = min(o_y)
    lo_x = min(o_x)
    ext_y = max(o_y[d] + len_y[d] - 1 for d in range(2)) - lo_y + 1
    ext_x = max(o_x[d] + len_x[d] - 1 for d in range(2)) - lo_x + 1
    kk_y = max(ext_y, 2 * (-lo_y) + 1)
    kk_x = max(ext_x, 2 * (-lo_x) + 1)
    kk_y += 1 - kk_y % 2
    kk_x += 1 - kk_x % 2
    pb_y, pb_x = (kk_y - 1) // 2, (kk_x - 1) // 2
    merged = np.zeros((kk_y, kk_x, cin, 4 * cout), kernel.dtype)
    for dy in range(2):
        taps_y, start_y = cls_y[dy]
        for dx in range(2):
            taps_x, start_x = cls_x[dx]
            if not taps_y or not taps_x:
                continue
            sub = kernel[taps_y[0]::2, taps_x[0]::2]
            cls = dy * 2 + dx
            merged[start_y + pb_y:start_y + pb_y + len(taps_y),
                   start_x + pb_x:start_x + pb_x + len(taps_x), :,
                   cls * cout:(cls + 1) * cout] = sub
    pk, pads_y, pads_x, s_packed = _np_packed_kernel(
        merged, stride=1, fin=fin, fout=fo)
    perm = np.empty(fout * fout * cout, np.int64)
    for gy in range(fo):
        for gx in range(fo):
            for dy in range(2):
                for dx in range(2):
                    src = ((gy * fo + gx) * 4 + dy * 2 + dx) * cout
                    dst = ((((gy * 2 + dy) * fo + gx) * 2) + dx) * cout
                    perm[dst:dst + cout] = np.arange(src, src + cout)
    return pk[..., perm], pads_y, pads_x, s_packed


def _pad_kernel(pk: np.ndarray) -> np.ndarray:
    """Zero-pad the packed kernel's channel dims to lane multiples."""
    ph, pw, cin, cout = pk.shape
    out = np.zeros((ph, pw, _round_up(cin, LANE), _round_up(cout, LANE)),
                   np.float32)
    out[:, :, :cin, :cout] = pk
    return out


# ---------------------------------------------------------------------------
# Static stage schedule
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class _Stage:
    name: str
    kind: str                      # 'conv' | 'pointwise'
    src: str                       # 'content' | 'actA' | 'actB'
    dst: str                       # 'actA' | 'actB' | 'out'
    cin: int = 0                   # padded packed input channels
    cout: int = 0                  # padded packed output channels
    lo_y: int = 0
    ph: int = 1
    lo_x: int = 0
    pw: int = 1
    # input transform (consumer side of the previous layer's CIN):
    in_affine: bool = False
    in_relu: bool = False
    skip_in: Optional[str] = None  # 'skipA' | 'skipB'
    skip_out: Optional[str] = None
    # epilogue on the f32 accumulator:
    epi: str = "none"              # 'contract' | 'relu' | 'bias' | 'sigmoid'
    dst_c0: int = 0                # output channel offset in dst (N-split)
    # CIN stats of THIS stage's output:
    stats: bool = False
    style_slot: int = -1           # row in the style table
    group: Optional[str] = None    # None | 'e0' | 'e1' | 'e2' | 'fin'
    n_per_channel: int = 0
    c_packed: int = 0              # real (unpadded) packed channel count
    # dual-style: which packed weight-mip buffer blends in_affine (by the
    # PRODUCER stage's resolution); ignored unless the kernel runs dual
    w_src: Optional[str] = None    # 'wB' | 'wE0' | 'wE1' | 'wFin'
    # per-stage band grid (rst-1920 two-segment kernels mix a (H/4, W/4)
    # content grid and a (H/8, W/8) bottleneck grid; flagship plans use one)
    hp: int = 0
    wp: int = 0
    # grid-transition producer: 'fold2' re-lays the stage's (th, wp, cout)
    # output band as (th/2, wp/2, 4*cout) bottleneck-grid f2 channels
    # (two content-grid rows -> one bottleneck row); 'unfold2' is the inverse
    # (bottleneck-f4 output -> content-grid f2 rows).  The column fold is a
    # free row-major reshape; the row pairing is the sublane interleave
    # formulation proven to lower in Mosaic (tools/probe_repack_ops.py).
    repack: Optional[str] = None   # None | 'fold2' | 'unfold2'
    # int8-quantized activation edge (quant engines only): q_out_si >= 0
    # makes this producer quantize its f32 epilogue output with the
    # CONSUMER's act_inv row (that row's kernel index) and store int8 to the
    # dst's int8 twin buffer; q_in makes this consumer read the int8 twin
    # and skip its in-band quantize pass.  Eligible edges are computed in
    # _build: the consumer must be a transform-free conv (no in_affine/
    # in_relu/skips), so the quantize point is IDENTICAL to the in-band one
    # (same values modulo the skipped bf16 round-trip) and calibration
    # scales transfer unchanged.
    q_out_si: int = -1
    q_in: bool = False


class FusedTransfer:
    """One-kernel packed inference for a fixed plan + variables (batch 1)."""

    def __init__(self, variables, plan: TransferPlan, *,
                 num_styles: int = 1,
                 cin_epsilon: float = CIN_EPS, interpret: bool = False,
                 debug_stages: Optional[int] = None,
                 quant: Optional[str] = None,
                 act_scales: Optional[np.ndarray] = None,
                 direct_ring: Optional[bool] = None,
                 wmip_resident: Optional[bool] = None,
                 q_edges: Optional[bool] = None,
                 wb_expanded: Optional[bool] = None,
                 k_resident: Optional[bool] = None):
        if (plan.num_contract_blocks, plan.num_expand_blocks) not in (
                (2, 2), (3, 3)):
            raise ValueError("fused kernel supports the 2-contract/2-expand "
                             "(flagship) and 3-contract/3-expand (divider-1) "
                             "families; use stylize_packed otherwise")
        # rst-1920 family (resolution_divider=1, reference shape_config.py:
        # 14-15, block math styleTransfer.py:217,258): two-segment schedule —
        # stem/c1/c2 + e2/final/finish on the (H/4, W/4) content grid,
        # c3/res-core/e0/e1 on the (H/8, W/8) bottleneck grid, with the grid
        # transitions folded into c2's and e1's output bands (_Stage.repack).
        self.three_seg = plan.num_contract_blocks == 3
        if plan.bottleneck_num_filters > LANE:
            # the residual-skip ping-pong buffers and their DMA slices are
            # fixed at one LANE of channels
            raise ValueError(
                f"fused kernel supports <= {LANE} bottleneck filters "
                f"(got {plan.bottleneck_num_filters}); use stylize_packed")
        if num_styles not in (1, 2):
            raise ValueError("fused kernel supports 1 or 2 styles "
                             "(reference blends exactly two)")
        self.dual = num_styles == 2
        self.plan = plan
        self.eps = float(cin_epsilon)
        self.interpret = interpret
        # debug_stages: emit only the first N stages (per-stage time bisects —
        # tools/bisect_fused.py); the stylized output is then meaningless.
        self.debug_stages = debug_stages
        h, w, self._c_in = plan.input_shape
        self.hp, self.wp = h // 4, w // 4          # content grid (f4)
        if self.three_seg:
            self.hp_s, self.wp_s = h // 8, w // 8  # bottleneck grid
        else:
            self.hp_s, self.wp_s = self.hp, self.wp
        if self.wp % 8 or self.wp_s % 8:
            raise ValueError(f"packed widths {self.wp}/{self.wp_s} must be "
                             "multiples of 8")
        self.th = max(t for t in (8, 4, 2, 1) if self.hp % t == 0 and t <= 8)
        if self.hp // self.th < 2 or self.hp_s < 4:
            raise ValueError("need at least 2 row bands")
        if self.three_seg and num_styles != 1:
            raise ValueError(
                "dual-style is not yet supported on the 3-contract "
                "(divider-1) fused kernel; use stylize_packed")
        # pre-expanded VMEM-resident wB (A/B vs the compact plane's in-kernel
        # broadcast; _WB_EXPANDED)
        self._wb_expanded = self.dual and (
            _WB_EXPANDED if wb_expanded is None else bool(wb_expanded))
        # compact VMEM-resident wB plane needs 8-aligned window math
        self._wb_resident = (self.dual and self.hp % 8 == 0
                             and not self._wb_expanded)
        # expand-resolution mips resident in VMEM (dual only; ~30 MB on the
        # flagship — needs the raised scoped-VMEM cap, see _launch)
        self._w_all_resident = self.dual and (
            _WMIP_RESIDENT if wmip_resident is None else bool(wmip_resident))
        # int8 deploy quantization (opt-in): int8 kernels (per-cout scales)
        # x int8 activations (static per-stage scales from calibrate_act_
        # scales) on the conv-stage MXU path; accumulate int32, dequantize
        # into the f32 epilogue.  The v5e MXU's int8 peak is 2x bf16, and
        # the bf16 MXU floor is ~70% of the measured frame (ROADMAP
        # "Executed-FLOP audit").  No reference counterpart (the reference
        # deploys f32 ONNX); this is a deploy-mode knob like TF-Lite PTQ.
        if quant not in (None, "int8"):
            raise ValueError(f"quant must be None or 'int8', got {quant!r}")
        self.quant = quant == "int8"
        # Direct band-DMA-to-compute-ring on no-transform stages (module
        # docstring / finding 9 re-land).  Constructor overrides the env
        # default (RST_FUSED_DIRECT_RING) for A/B measurement.
        self.direct = _DIRECT_RING if direct_ring is None else bool(direct_ring)
        # Producer-quantized int8 edges (module docstring at _Q_EDGES);
        # constructor override for A/B measurement.
        self._use_q_edges = self.quant and (
            _Q_EDGES if q_edges is None else bool(q_edges))
        # VMEM-resident kernels (A/B; _K_RESIDENT)
        self._k_resident = (
            _K_RESIDENT if k_resident is None else bool(k_resident))
        if self.quant and act_scales is None:
            raise ValueError("quant='int8' requires act_scales from "
                             "calibrate_act_scales() on the bf16 engine")
        self._quant_act_scales = act_scales
        self._build(variables)

    # ---- host-side weight prep ------------------------------------------

    def _build(self, variables) -> None:
        params = variables["params"]
        stats = variables["batch_stats"]
        params = params.get("transfer", params)
        stats = stats.get("transfer", stats)
        plan = self.plan
        filters = plan.bottleneck_num_filters
        hp, wp = self.hp, self.wp
        n_px = hp * wp

        def conv_np(name):
            return (np.asarray(params[name]["kernel"], np.float32),
                    np.asarray(params[name]["bias"], np.float32))

        def bn_affine(name):
            inv = 1.0 / np.sqrt(
                np.asarray(stats[name]["var"], np.float32) + 1e-3)
            scale = np.asarray(params[name]["scale"], np.float32) * inv
            bias = (np.asarray(params[name]["bias"], np.float32)
                    - np.asarray(stats[name]["mean"], np.float32) * scale)
            return scale, bias

        kernels: List[np.ndarray] = []
        stages: List[_Stage] = []
        biases: List[np.ndarray] = []
        contract_rows: List[np.ndarray] = []

        # N-split threshold: a stage kernel bigger than this forces tiny row
        # bands (the stem's 3.5 MB fin4 kernel measured 1.03 ms of the 2.0 ms
        # frame with th=3); splitting cout re-reads the input bands (cheap)
        # but doubles the band height.
        SPLIT_BYTES = 2 * 2 ** 20

        def add_conv(name, pk_meta, *, src, dst, bias, grid,
                     contract_scale=None, contract_shift=None, **kw):
            pk, (lo_y, ph_e), (lo_x, pw_e), s = pk_meta
            assert s == 1, (name, s)
            pkp = _pad_kernel(pk)
            b = np.zeros(ACT_C, np.float32)
            b[:bias.size] = bias
            n_halves = (2 if pkp.size * 2 > SPLIT_BYTES
                        and pkp.shape[3] % (2 * LANE) == 0
                        and not kw.get("stats")
                        and kw.get("repack") is None else 1)
            half = pkp.shape[3] // n_halves
            for hi in range(n_halves):
                kernels.append(
                    np.ascontiguousarray(pkp[..., hi * half:(hi + 1) * half]))
                bh = np.zeros(ACT_C, np.float32)
                bh[:half] = b[hi * half:(hi + 1) * half]
                biases.append(bh)
                row = np.zeros((2, ACT_C), np.float32)
                if contract_scale is not None:
                    cs = np.zeros(pkp.shape[3], np.float32)
                    cb = np.zeros(pkp.shape[3], np.float32)
                    cs[:contract_scale.size] = contract_scale
                    cb[:contract_shift.size] = contract_shift
                    row[0, :half] = cs[hi * half:(hi + 1) * half]
                    row[1, :half] = cb[hi * half:(hi + 1) * half]
                contract_rows.append(row)
                stages.append(_Stage(
                    name=name if n_halves == 1 else f"{name}_n{hi}",
                    kind="conv", src=src, dst=dst,
                    cin=pkp.shape[2], cout=half, dst_c0=hi * half,
                    lo_y=lo_y, ph=ph_e, lo_x=lo_x, pw=pw_e,
                    hp=grid[0], wp=grid[1], **kw,
                ))
            return n_halves

        GL = (hp, wp)                        # content grid (f4)
        GS = (self.hp_s, self.wp_s)          # bottleneck grid
        n_px_s = self.hp_s * self.wp_s
        three = self.three_seg

        # --- contract stack (fin4 scheme: stride-1 on the content grid) ---
        k, b = conv_np("contract_0_conv")
        s_bn, b_bn = bn_affine("contract_0_bn")
        add_conv("stem", _np_packed_kernel(k, stride=1, fin=4, fout=4),
                 src="content", dst="actLA" if three else "actA", grid=GL,
                 bias=np.tile(b, 16), epi="contract",
                 contract_scale=np.tile(s_bn, 16),
                 contract_shift=np.tile(b_bn, 16))

        k, b = conv_np("contract_1_conv")
        s_bn, b_bn = bn_affine("contract_1_bn")
        add_conv("c1", _np_packed_kernel(k, stride=2, fin=4, fout=2),
                 src="actLA" if three else "actA",
                 dst="actLB" if three else "actB", grid=GL,
                 bias=np.tile(b, 4), epi="contract",
                 contract_scale=np.tile(s_bn, 4),
                 contract_shift=np.tile(b_bn, 4))

        k, b = conv_np("contract_2_conv")
        s_bn, b_bn = bn_affine("contract_2_bn")
        if three:
            # c2 stays on the content grid; its output band folds into the
            # bottleneck grid's f2 layout (repack='fold2'): LANE-strided
            # (row-parity, col-parity) channel blocks so c3's tap chunks
            # stay skippable at MXU granularity.
            add_conv("c2", _np_packed_kernel(k, stride=2, fin=2, fout=1),
                     src="actLB", dst="actA", grid=GL, bias=b,
                     epi="contract", contract_scale=s_bn,
                     contract_shift=b_bn, repack="fold2")
            k, b = conv_np("contract_3_conv")
            s_bn, b_bn = bn_affine("contract_3_bn")
            pk, pads_y, pads_x, s = _np_packed_kernel(
                k, stride=2, fin=2, fout=1)
            # expand the canonical compact f2 cin (4 * c_logical rows) to the
            # fold2 layout's LANE-strided blocks (cin rows are host numpy)
            c_log = k.shape[2]
            wide = np.zeros(pk.shape[:2] + (4 * LANE, pk.shape[3]), pk.dtype)
            for blk in range(4):
                wide[:, :, blk * LANE:blk * LANE + c_log] = \
                    pk[:, :, blk * c_log:(blk + 1) * c_log]
            add_conv("c3", (wide, pads_y, pads_x, s),
                     src="actA", dst="actB", grid=GS, bias=b,
                     epi="contract", contract_scale=s_bn,
                     contract_shift=b_bn)
            cur = "actB"
        else:
            add_conv("c2", _np_packed_kernel(k, stride=2, fin=2, fout=1),
                     src="actB", dst="actA", grid=GL, bias=b, epi="contract",
                     contract_scale=s_bn, contract_shift=b_bn)
            cur = "actA"

        # --- residual core ---------------------------------------------------
        style_slot = 0
        skip_names = ("skipA", "skipB")

        def flip(cur):
            return {"actA": "actB", "actB": "actA",
                    "actLA": "actLB", "actLB": "actLA"}[cur]

        for ri in range(NUM_RESIDUAL_BLOCKS):
            for ci in range(2):
                k, b = conv_np(f"residual_{ri}_conv{ci}")
                src, dst = cur, flip(cur)
                cur = dst
                is_a = ci == 0
                skip_in = skip_out = None
                if is_a and ri >= 1:
                    skip_out = skip_names[(ri - 1) % 2]
                    if ri >= 2:
                        skip_in = skip_names[ri % 2]
                add_conv(
                    f"res{ri}{'ab'[ci]}",
                    _np_packed_kernel(k, stride=1, fin=1, fout=1),
                    src=src, dst=dst, grid=GS, bias=b, epi="relu",
                    in_affine=ri + ci > 0, in_relu=not is_a,
                    skip_in=skip_in, skip_out=skip_out,
                    stats=True, style_slot=style_slot, group=None,
                    n_per_channel=n_px_s, c_packed=filters, w_src="wB",
                )
                style_slot += 1

        # --- expand stack -----------------------------------------------------
        e0_f = plan.expand_blocks[0][0]
        e1_f = plan.expand_blocks[1][0]
        fin_f = plan.expand_blocks[-1][0]
        k, b = conv_np("expand_0_conv")
        add_conv("e0", _np_transpose_kernel(k, fin=1, fout=2),
                 src=cur, dst=flip(cur), grid=GS,
                 bias=np.tile(b, 4), epi="bias",
                 in_affine=True, in_relu=False,
                 skip_in=skip_names[NUM_RESIDUAL_BLOCKS % 2], skip_out=None,
                 stats=True, style_slot=style_slot, group="e0",
                 n_per_channel=n_px_s * 4, c_packed=4 * e0_f, w_src="wB")
        style_slot += 1

        cur = flip(cur)
        k, b = conv_np("expand_1_conv")
        e2_f = None
        if three:
            pk, pads_y, pads_x, s = _np_transpose_kernel(k, fin=2, fout=4)
            # cout perm (fy,fx,c) -> (row-parity, col-parity, ey, ex, c): the
            # unfold2 repack addresses (ry, rx) by lane slice / column unfold.
            # The CIN machinery (group mats, style tiling, downstream affine
            # consumption) is block-order invariant — per-channel values
            # repeat per logical channel across parity blocks.
            c = k.shape[3]
            perm = np.empty(16 * c, np.int64)
            d = 0
            for ry in range(2):
                for rx in range(2):
                    for ey in range(2):
                        for ex in range(2):
                            sb = (ry * 2 + ey) * 4 + (rx * 2 + ex)
                            perm[d * c:(d + 1) * c] = np.arange(
                                sb * c, (sb + 1) * c)
                            d += 1
            add_conv("e1", (pk[..., perm], pads_y, pads_x, s),
                     src=cur, dst="actLB", grid=GS,
                     bias=np.tile(b, 16), epi="bias",
                     in_affine=True, in_relu=True,
                     stats=True, style_slot=style_slot, group="e1",
                     n_per_channel=n_px_s * 16, c_packed=16 * e1_f,
                     repack="unfold2")
            style_slot += 1
            cur = "actLB"
            e2_f = plan.expand_blocks[2][0]
            k, b = conv_np("expand_2_conv")
            add_conv("e2", _np_transpose_kernel(k, fin=2, fout=4),
                     src=cur, dst="actLA", grid=GL,
                     bias=np.tile(b, 16), epi="bias",
                     in_affine=True, in_relu=True,
                     stats=True, style_slot=style_slot, group="e2",
                     n_per_channel=n_px * 16, c_packed=16 * e2_f)
            style_slot += 1
            cur = "actLA"
        else:
            add_conv("e1", _np_transpose_kernel(k, fin=2, fout=4),
                     src=cur, dst=flip(cur), grid=GS,
                     bias=np.tile(b, 16), epi="bias",
                     in_affine=True, in_relu=True,
                     stats=True, style_slot=style_slot, group="e1",
                     n_per_channel=n_px_s * 16, c_packed=16 * e1_f,
                     w_src="wE0")
            style_slot += 1
            cur = flip(cur)

        k, b = conv_np(f"expand_{self.plan.num_expand_blocks}_conv")
        add_conv("final", _np_packed_kernel(k, stride=1, fin=4, fout=4),
                 src=cur, dst=flip(cur), grid=GL,
                 bias=np.tile(b, 16), epi="bias",
                 in_affine=True, in_relu=True,
                 stats=True, style_slot=style_slot, group="fin",
                 n_per_channel=n_px * 16, c_packed=16 * fin_f, w_src="wE1")
        style_slot += 1

        cur = flip(cur)
        stages.append(_Stage(
            name="finish", kind="pointwise",
            src=cur, dst="out",
            cin=LANE, cout=LANE, epi="sigmoid", in_affine=True, w_src="wFin",
            hp=hp, wp=wp,
        ))

        # group-combine matrices (logical-channel averaging across parities)
        def gmat(c_logical, f2, c_packed, width):
            g = np.zeros((width, width), np.float32)
            for i in range(c_packed):
                for j in range(c_packed):
                    if i % c_logical == j % c_logical:
                        g[i, j] = 1.0
            return g

        self._g = {
            "e0": gmat(e0_f, 4, 4 * e0_f, LANE),
            "e1": gmat(e1_f, 16, 16 * e1_f, STATS_C),
        }
        exp_layout = [("e0", e0_f, 4), ("e1", e1_f, 16)]
        if three:
            self._g["e2"] = gmat(e2_f, 16, 16 * e2_f, LANE)
            exp_layout.append(("e2", e2_f, 16))
        self._g["fin"] = gmat(fin_f, 16, 16 * fin_f, LANE)
        exp_layout.append(("fin", fin_f, 16))
        self._style_layout = [("res", filters, 1)] * 10 + exp_layout

        # ---- int8 activation edges (quant engines; _Q_EDGES) ----------------
        # A producer ships int8 when every reader of its dst version (up to
        # the next overwrite; N-split halves of one conv co-write a version)
        # is a single transform-free conv: the quantize point then moves
        # into the producer's epilogue bit-compatibly (same act_inv row,
        # minus the bf16 round-trip) and the edge's ring bytes halve.
        self._q_dsts: Tuple[str, ...] = ()
        if self._use_q_edges:
            def base(n: str) -> str:
                return n.split("_n")[0]

            conv_row = {}
            row = 0
            for idx, st in enumerate(stages):
                if st.kind == "conv":
                    conv_row[idx] = row
                    row += 1
            q_out_rows: dict = {}
            q_in_idx: set = set()
            q_dsts: List[str] = []
            for i, st in enumerate(stages):
                if (st.kind != "conv" or st.repack is not None
                        or st.dst == "out" or st.stats):
                    continue
                readers = []
                for j in range(i + 1, len(stages)):
                    nx = stages[j]
                    if nx.dst == st.dst and base(nx.name) != base(st.name):
                        break  # dst version overwritten
                    if nx.src == st.dst and base(nx.name) != base(st.name):
                        readers.append(j)
                if len(readers) != 1:
                    continue
                c = stages[readers[0]]
                if (c.kind != "conv" or c.in_affine or c.in_relu
                        or c.skip_in is not None or c.skip_out is not None):
                    continue
                q_out_rows[i] = conv_row[readers[0]]
                q_in_idx.add(readers[0])
                if st.dst not in q_dsts:
                    q_dsts.append(st.dst)
            for i, st in enumerate(stages):
                if i in q_out_rows or i in q_in_idx:
                    stages[i] = dataclasses.replace(
                        st, q_out_si=q_out_rows.get(i, -1),
                        q_in=i in q_in_idx)
            self._q_dsts = tuple(q_dsts)

        self.stages = tuple(stages)
        # Packed kernels are structurally sparse at two granularities, both
        # host-known and exactness-preserving to skip:
        #  - whole (dy, dx) tap matrices that are all-zero (transpose packing
        #    leaves 5 of 9 slots empty in e0/e1);
        #  - 128-row cin chunks of a tap that are all-zero (stride packing
        #    zeroes input-subpixel groups per tap: c1 keeps 1/4 on two taps,
        #    the stem's channel padding zeroes one chunk on three taps).
        # The MXU contracts in 128 chunks, so skipping them is free speedup.
        self._taps = []
        for k in kernels:
            tap_chunks = {}
            n_chunks = k.shape[2] // LANE
            for dy in range(k.shape[0]):
                for dx in range(k.shape[1]):
                    nz = [c for c in range(n_chunks)
                          if np.any(k[dy, dx, c * LANE:(c + 1) * LANE])]
                    if not nz:
                        continue
                    # merge into contiguous (c0, c1) LANE-row ranges
                    ranges, start, prev = [], nz[0], nz[0]
                    for c in nz[1:]:
                        if c != prev + 1:
                            ranges.append((start * LANE, (prev + 1) * LANE))
                            start = c
                        prev = c
                    ranges.append((start * LANE, (prev + 1) * LANE))
                    tap_chunks[(dy, dx)] = ranges
            self._taps.append(tap_chunks)
        if self.quant:
            scales = np.asarray(self._quant_act_scales, np.float32)
            if scales.shape != (len(kernels), ACT_C):
                raise ValueError(
                    f"act_scales must be ({len(kernels)}, {ACT_C}) per-"
                    f"channel maxima from calibrate_act_scales(); got "
                    f"{scales.shape}")
            q_kernels, dq_rows, inv_rows = [], [], []
            for k, s_row in zip(kernels, scales):
                # per-INPUT-channel activation scales fold exactly into the
                # weight's cin rows: y = sum_c (x_c/s_c)(k_c*s_c) — so mixed-
                # range G-buffer channels don't crush each other's precision;
                # then symmetric per-OUTPUT-channel weight scales for int8
                s_c = np.maximum(s_row[:k.shape[2]], 1e-6)
                k_scaled = k * s_c[None, None, :, None]
                s_w = np.abs(k_scaled).reshape(-1, k.shape[3]).max(axis=0)
                s_w = np.maximum(s_w / 127.0, 1e-12)
                q_kernels.append(
                    np.clip(np.rint(k_scaled / s_w), -127, 127)
                    .astype(np.int8))
                dq = np.zeros(ACT_C, np.float32)
                dq[:k.shape[3]] = s_w / 127.0
                dq_rows.append(dq)
                inv = np.zeros(ACT_C, np.float32)
                inv[:k.shape[2]] = 127.0 / s_c
                inv_rows.append(inv)
            self._kernels = [jnp.asarray(k) for k in q_kernels]
            self._dequant = jnp.asarray(np.stack(dq_rows))
            self._act_inv = jnp.asarray(np.stack(inv_rows))
        else:
            self._kernels = [jnp.asarray(k, jnp.bfloat16) for k in kernels]
        self._biases = jnp.asarray(np.stack(biases), jnp.float32)
        self._contract = jnp.asarray(np.stack(contract_rows), jnp.float32)
        self._g_jnp = {k: jnp.asarray(v) for k, v in self._g.items()}
        self._jitted = jax.jit(self._forward)
        self._jitted_prepared = jax.jit(self._forward_prepared)
        self._jitted_prepacked = jax.jit(
            lambda p, prep: self._unpack_out(self._run_packed(p, prep)))
        self._jitted_prepacked_raw = jax.jit(
            lambda p, prep: self._run_packed(p, prep)[0])
        self._jitted_prepacked_chunk = jax.jit(
            lambda p, prep: self._unpack_out_chunk(
                self._run_packed_chunk(p, prep)))
        self._jit_prepare = jax.jit(self._prepare)
        self._jitted_calibrate = None  # built lazily on first calibration

    # ---- style table (per call; tiny jnp ops under jit) -------------------

    def _style_table(self, style_params: jnp.ndarray) -> jnp.ndarray:
        """(S, P) style vectors -> (13, 2*S, STATS_C) tiled scale/bias table.

        Row layout per slot: ``[scale_s0, bias_s0, scale_s1, bias_s1]`` (the
        last two only when dual) — the kernel folds each style's rows with the
        shared moments and blends base + delta per pixel.
        """
        n_styles = 2 if self.dual else 1
        sp = style_params.reshape(n_styles, self.plan.num_style_parameters)
        rows = []
        offset = 0
        for _name, c, f2 in self._style_layout:
            row = jnp.zeros((2 * n_styles, STATS_C), jnp.float32)
            for s in range(n_styles):
                scale = sp[s, offset:offset + c]
                bias = sp[s, offset + c:offset + 2 * c]
                row = row.at[2 * s, :c * f2].set(jnp.tile(scale, f2))
                row = row.at[2 * s + 1, :c * f2].set(jnp.tile(bias, f2))
            offset += 2 * c
            rows.append(row)
        assert offset == self.plan.num_style_parameters
        return jnp.stack(rows)

    # ---- the kernel ---------------------------------------------------------

    def _direct_ok(self, st: _Stage) -> bool:
        """Stage qualifies for the direct band-DMA-to-compute-ring path:
        no input transform (the staging pass would be a pure copy) and no
        skip-out (which reads the transformed band).  quant engines keep the
        staging pass — there it IS the int8 quantize, not a copy."""
        return (self.direct and st.kind == "conv"
                and not st.in_affine and not st.in_relu
                and st.skip_in is None and st.skip_out is None
                and st.repack is None and not self.quant)

    def _pick_th(self, si: int, st: _Stage, *, calibrate: bool = False,
                 check: bool = False) -> int:
        """Largest band height whose stage VMEM footprint stays in budget.

        Bigger bands amortize per-band DMA issue/copy overhead and the band
        loop itself; the f32 accumulator and the double-buffered rings set
        the ceiling.  Dual-style stages keep more elementwise temporaries
        live in the blend chain (wv broadcast + two products), so they are
        charged double for the transform temp and held to a 12 MB budget;
        single-style stages fit a 14 MB budget (both calibrated against
        compiler scoped-alloc reports — 14 MB with the dual charges tripped
        the 16 MB scoped-VMEM limit by ~0.5 MB on the flagship, r3).
        """
        hp, wp = st.hp, st.wp
        has_skip = st.skip_in is not None or st.skip_out is not None
        w_resident = (self.dual and st.in_affine and st.w_src == "wB"
                      and self._wb_resident)
        w_vmem = (self.dual and st.in_affine and st.w_src is not None
                  and (self._wb_expanded if st.w_src == "wB"
                       else self._w_all_resident))
        has_w = (self.dual and st.in_affine and st.w_src is not None
                 and not w_resident and not w_vmem)
        has_transform = (st.in_affine or st.in_relu
                         or st.skip_in is not None)
        budget = int((_BUDGET_DUAL_MB if self.dual else _BUDGET_MB) * 2 ** 20)
        # int8 mode: temp + kernel shrink to 1 byte/elt, but the f32
        # quantize chain keeps an extra temporary live
        mm_sz = 1 if self.quant else 2
        direct = self._direct_ok(st) and not calibrate and not check
        # fold2 pairs output rows: band height must be even
        lo = 2 if st.repack == "fold2" else 1
        for th in sorted((d for d in range(lo, hp // 2 + 1)
                          if hp % d == 0 and d % lo == 0),
                         reverse=True):
            rows = th + st.ph - 1
            wpad = _round_up(wp + st.pw - 1, 8)
            if direct:
                # double-buffered padded compute ring (no staging ring) +
                # the traced-slot band value the tap matmuls read from;
                # content sits at the 8-aligned column offset (DMA dst rule)
                xw_d = _round_up(-st.lo_x, 8)
                wpad_d = _round_up(xw_d + wp + (st.pw - 1 + st.lo_x), 8)
                est = (
                    2 * rows * wpad_d * st.cin * 2    # DMA'd compute ring
                    + rows * wpad_d * st.cin * 2      # traced-slot band read
                    + 2 * th * wp * st.cout * 2       # out ring
                    + th * wp * st.cout * 4           # f32 accumulator
                    + int(np.prod(self._kernels[si].shape)) * 2
                )
                if est <= budget or th == 1:
                    return th
                continue
            est = (
                rows * wpad * st.cin * mm_sz          # padded temp
                + 2 * rows * wp * st.cin * 2          # staging ring
                + 2 * th * wp * st.cout * 2           # out ring
                + th * wp * st.cout * 4               # f32/i32 accumulator
                + int(np.prod(self._kernels[si].shape)) * mm_sz
            )
            if has_transform:
                # bf16 chain temp; dual blends keep a second one live
                est += rows * wp * st.cin * (4 if self.dual else 2)
            if self.quant:
                est += rows * wp * st.cin * 4         # f32 quantize temp
            if calibrate:
                # calibration materializes |xt| as a full-band f32 temp
                est += rows * wp * st.cin * 4
            if check:
                # the saturation check keeps a second f32 band temp live
                # (the |x|*inv comparison chain)
                est += rows * wp * st.cin * 4
            if has_skip:
                est += 2 * (rows + th) * wp * LANE * 2
            if has_w or w_resident:
                # streamed ring, or the resident plane's broadcast temps
                est += 2 * rows * wp * st.cin * 2
            if st.repack is not None:
                # repack transform temporaries; unfold2 additionally pads the
                # out ring to LANE channels (2x the logical band bytes)
                est += (4 if st.repack == "unfold2" else 2) * \
                    th * wp * st.cout * 2
            if est <= budget or th == lo:
                return th
        return lo

    def _kernel_fn(self, content, *refs):
        return self._kernel_impl(False, content, *refs)

    def _kernel_fn_chunked(self, content, *refs):
        return self._kernel_impl(True, content, *refs)

    def _kernel_fn_calibrate(self, content, *refs):
        return self._kernel_impl(False, content, *refs, calibrate=True)

    def _kernel_fn_check(self, content, *refs):
        return self._kernel_impl(False, content, *refs, calibrate=True,
                                 check=True)

    def _kernel_impl(self, chunked, content, *refs, calibrate=False,
                     check=False):
        n_k = len(self._kernels)
        kernel_refs = refs[:n_k]
        n_w = 4 if self.dual else 0
        g_names = list(self._g)
        n_t = 3 + len(g_names)
        bias_tbl, contract_tbl, style_tbl, *g_refs = refs[n_k:n_k + n_t]
        nt = n_k + n_t
        dequant_tbl = act_inv_tbl = None
        if self.quant:
            dequant_tbl, act_inv_tbl = refs[nt:nt + 2]
            nt += 2
        check_inv_tbl = None
        if check:
            check_inv_tbl = refs[nt]
            nt += 1
        w_refs = refs[nt:nt + n_w]
        tail = refs[nt + n_w:]
        cal_out = cal_sc = None
        act_la = act_lb = None
        # outputs: base act/skip buffers (+ content-grid pair, three_seg)
        # (+ int8 edge twins, quant) (+ cal row, calibrate); then scratch.
        # calibrate/check run on bf16 engines, so q twins and cal_out are
        # mutually exclusive.
        n_base = 7 if self.three_seg else 5
        n_q = len(self._q_dsts)
        n_outs = n_base + n_q + (1 if calibrate else 0)
        outs, scr = tail[:n_outs], tail[n_outs:]
        out_ref, act_a, act_b, skip_a, skip_b = outs[:5]
        if self.three_seg:
            act_la, act_lb = outs[5:7]
        q_refs = outs[n_base:n_base + n_q]
        if calibrate:
            cal_out = outs[-1]
            stats_sc, affine_sc, ksem, cal_sc = scr
            # zero the padded rows once; stages overwrite their own row
            cal_out[...] = jnp.zeros_like(cal_out)
        else:
            stats_sc, affine_sc, ksem = scr
        if chunked:
            # Chunk mode: grid=(N,) iterates frames SEQUENTIALLY inside ONE
            # kernel launch (amortizes launch + per-launch host dispatch).
            # Content/out get a leading frame axis; the activation/skip
            # ping-pong buffers are reused across frames.
            frame = pl.program_id(0)
            content = content.at[frame]
            out_ref = out_ref.at[frame]
        g_by_name = dict(zip(g_names, g_refs))
        buf = {"content": content, "actA": act_a, "actB": act_b,
               "skipA": skip_a, "skipB": skip_b, "out": out_ref}
        if self.three_seg:
            buf.update({"actLA": act_la, "actLB": act_lb})
        bufq = dict(zip(self._q_dsts, q_refs))  # int8 edge twins
        if self.dual:
            buf.update({"wB": w_refs[0], "wE0": w_refs[1],
                        "wE1": w_refs[2], "wFin": w_refs[3]})
        eps = self.eps

        def fold_cin_affine(st: _Stage):
            """Fold the accumulated moments with the stage's style rows into
            the consumer-side CIN affine (base + dual deltas) in affine_sc."""
            n = jnp.float32(st.n_per_channel)
            if st.group is not None:
                g = g_by_name[st.group]
                gw = g.shape[0]
                sums = jnp.dot(stats_sc[0:1, :gw], g[...],
                               preferred_element_type=jnp.float32)
                sqs = jnp.dot(stats_sc[1:2, :gw], g[...],
                              preferred_element_type=jnp.float32)
            else:
                gw = STATS_C
                sums = stats_sc[0:1, :]
                sqs = stats_sc[1:2, :]
            mean = sums / n
            var = sqs / n - mean * mean
            inv = jax.lax.rsqrt(var + jnp.float32(eps))
            a = style_tbl[st.style_slot, 0:1, :gw] * inv
            b = style_tbl[st.style_slot, 1:2, :gw] - mean * a
            affine_sc[0:1, :gw] = a
            affine_sc[1:2, :gw] = b
            if self.dual:
                # per-pixel blend a0 + w*(a1-a0): store the deltas
                a1 = style_tbl[st.style_slot, 2:3, :gw] * inv
                b1 = style_tbl[st.style_slot, 3:4, :gw] - mean * a1
                affine_sc[2:3, :gw] = a1 - a
                affine_sc[3:4, :gw] = b1 - b

        def run_conv_direct(si: int, st: _Stage, k_ref):
            """Direct band-DMA-to-compute-ring (no staging pass).

            For stages whose staging write is a PURE COPY (no CIN affine /
            relu / skip — ``_direct_ok``), band loads DMA straight into a
            double-buffered padded compute ring, eliminating one full VPU
            pass over the band (~96 MB/frame across the flagship's five
            no-transform stages).  Edge bands load the same clamped full
            window the staging path loads and fix the row misalignment with
            one in-VMEM shift (2 of nb bands); the tap matmuls read a
            traced-slot band value (the Mosaic band copy r3's finding 9
            priced at ~2.3 MB scoped — affordable now that finding 12 showed
            the 16 MB scoped-VMEM limit is compiler conservatism, lifted via
            ``vmem_limit_bytes``)."""
            hp, wp = st.hp, st.wp
            th = self._pick_th(si, st, calibrate=calibrate, check=check)
            nb = hp // th
            rows = th + st.ph - 1
            first_shift = -st.lo_y
            last_shift = st.ph - 1 + st.lo_y
            # The shift corrections below only run on bands 0 and nb-1, so
            # interior bands assume the ``jnp.clip`` in ``in_dma`` never
            # fires for them — true iff th covers both halo shifts.  Every
            # currently eligible stage has packed halos <= 1 row, but a
            # future stage with a taller packed halo (or a tiny th forced by
            # a low RST_FUSED_BUDGET_MB) would clip bands 1 / nb-2 and
            # corrupt output silently; fail loudly instead.
            assert th >= max(first_shift, last_shift), (
                f"direct ring stage {st.name!r}: band height th={th} < halo "
                f"shift max({first_shift}, {last_shift}); raise the band "
                f"budget or exclude this stage in _direct_ok")
            # VMEM DMA destinations need 8-aligned sublane (column) offsets
            # (Mosaic memref_slice tiling proof), so the content lands at the
            # aligned column xw >= -lo_x and the tap reads shift by the
            # difference (value-level slices have no alignment constraint).
            xw = _round_up(-st.lo_x, 8)
            dx_shift = xw + st.lo_x
            wpad = _round_up(xw + wp + (st.pw - 1 + st.lo_x), 8)

            def body(*scratch):
                if self._k_resident:
                    temp, outb, insem, outsem = scratch
                    kbuf, cp = k_ref, None
                else:
                    temp, kbuf, outb, insem, outsem = scratch
                    cp = pltpu.make_async_copy(k_ref, kbuf, ksem)
                    cp.start()
                src = buf[st.src]

                def in_dma(slot, i):
                    w0 = i * th + st.lo_y
                    s = jnp.clip(w0, 0, hp - rows)
                    return pltpu.make_async_copy(
                        src.at[pl.ds(s, rows), :, pl.ds(0, st.cin)]
                        if st.src != "content" else src.at[pl.ds(s, rows)],
                        temp.at[slot, pl.ds(0, rows), pl.ds(xw, wp)],
                        insem.at[slot])

                def out_dma(slot, i):
                    return pltpu.make_async_copy(
                        outb.at[slot],
                        buf[st.dst].at[pl.ds(i * th, th), :,
                                       pl.ds(st.dst_c0, st.cout)],
                        outsem.at[slot])

                in_dma(0, 0).start()
                if cp is not None:
                    cp.wait()

                def band(i, _):
                    slot = i % 2
                    nxt = (i + 1) % 2

                    @pl.when(i + 1 < nb)
                    def _():
                        in_dma(nxt, i + 1).start()

                    in_dma(slot, i).wait()

                    # edge-band corrections: the clamped window loaded rows
                    # shifted by the halo; shift back in VMEM and zero the
                    # halo rows (2 of nb bands; the staging path pays the
                    # same work via its shifted writes)
                    if first_shift > 0:
                        @pl.when(i == 0)
                        def _():
                            x = temp[slot, 0:rows - first_shift, xw:xw + wp]
                            temp[slot, first_shift:rows, xw:xw + wp] = x
                            temp[slot, 0:first_shift, xw:xw + wp] = jnp.zeros(
                                (first_shift, wp, st.cin), temp.dtype)
                    if last_shift > 0:
                        @pl.when(i == nb - 1)
                        def _():
                            x = temp[slot, last_shift:rows, xw:xw + wp]
                            temp[slot, 0:rows - last_shift, xw:xw + wp] = x
                            temp[slot, rows - last_shift:rows,
                                 xw:xw + wp] = jnp.zeros(
                                (last_shift, wp, st.cin), temp.dtype)

                    band_src = temp[slot]  # one traced-slot read per band
                    taps = self._taps[si]
                    acc = jnp.zeros((th * wp, st.cout), jnp.float32)
                    for dx in sorted(set(d for _, d in taps)):
                        slab = band_src[:, dx + dx_shift:dx + dx_shift + wp, :]
                        for dy in range(st.ph):
                            if (dy, dx) not in taps:
                                continue
                            patch = slab[dy:dy + th].reshape(
                                th * wp, st.cin)
                            for c0, c1 in taps[(dy, dx)]:
                                acc += jnp.dot(
                                    patch[:, c0:c1], kbuf[dy, dx, c0:c1],
                                    preferred_element_type=jnp.float32)
                    bias = bias_tbl[si:si + 1, :st.cout]
                    if st.epi == "contract":
                        acc = jnp.maximum(acc + bias, 0.0)
                        cs = contract_tbl[si, 0:1, :st.cout]
                        cb = contract_tbl[si, 1:2, :st.cout]
                        acc = jnp.maximum(acc * cs + cb, 0.0)
                    elif st.epi == "relu":
                        acc = jnp.maximum(acc + bias, 0.0)
                    else:  # 'bias'
                        acc = acc + bias
                    if st.stats:
                        stats_sc[0:1, :st.cout] += jnp.sum(
                            acc, axis=0, keepdims=True)
                        stats_sc[1:2, :st.cout] += jnp.sum(
                            acc * acc, axis=0, keepdims=True)
                    outv = acc.astype(jnp.bfloat16)

                    @pl.when(i >= 2)
                    def _():
                        out_dma(slot, i - 2).wait()

                    outb[slot] = outv.reshape(th, wp, st.cout)
                    out_dma(slot, i).start()
                    return 0

                if st.stats:
                    stats_sc[...] = jnp.zeros_like(stats_sc)
                # zero the side column strips of BOTH ring slots once per
                # stage (bands only overwrite the content columns)
                for sl in range(2):
                    if xw > 0:
                        temp[sl, :, 0:xw, :] = jnp.zeros(
                            (rows, xw, st.cin), temp.dtype)
                    if wpad > xw + wp:
                        temp[sl, :, xw + wp:wpad, :] = jnp.zeros(
                            (rows, wpad - xw - wp, st.cin), temp.dtype)
                jax.lax.fori_loop(0, nb, band, 0)
                out_dma((nb - 2) % 2, nb - 2).wait()
                out_dma((nb - 1) % 2, nb - 1).wait()
                if st.stats:
                    fold_cin_affine(st)

            scratch = [
                pltpu.VMEM((2, rows, wpad, st.cin), jnp.bfloat16),
            ] + ([] if self._k_resident else [
                pltpu.VMEM(self._kernels[si].shape, jnp.bfloat16),
            ]) + [
                pltpu.VMEM((2, th, wp, st.cout), jnp.bfloat16),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ]
            pl.run_scoped(body, *scratch)

        def run_conv(si: int, st: _Stage, k_ref):
            hp, wp = st.hp, st.wp
            th = self._pick_th(si, st, calibrate=calibrate, check=check)
            nb = hp // th
            rows = th + st.ph - 1
            wpad = _round_up(wp + st.pw - 1, 8)
            first_shift = -st.lo_y
            last_shift = st.ph - 1 + st.lo_y
            has_skip = st.skip_in is not None or st.skip_out is not None
            w_resident = (self.dual and st.in_affine and st.w_src == "wB"
                          and self._wb_resident)  # f32 (hp, wp) plane in VMEM
            w_vmem = (self.dual and st.in_affine and st.w_src is not None
                      and (self._wb_expanded if st.w_src == "wB"
                           else self._w_all_resident))
            has_w = (self.dual and st.in_affine and st.w_src is not None
                     and not w_resident and not w_vmem)
            has_transform = (st.in_affine or st.in_relu
                             or st.skip_in is not None)
            # grid-transition producers re-lay the output band (module
            # docstring 'repack'); their out ring carries the re-laid shape
            if st.repack == "fold2":
                assert th % 2 == 0, (st.name, th)
                ob_rows, ob_wp, ob_c = th // 2, wp // 2, 4 * st.cout
            elif st.repack == "unfold2":
                ob_rows, ob_wp = 2 * th, 2 * wp
                ob_c = _round_up(st.cout // 4, LANE)
            else:
                ob_rows, ob_wp, ob_c = th, wp, st.cout
            assert st.repack is None or (
                st.skip_out is None and st.dst_c0 == 0), st.name

            def body(*scratch):
                it = iter(scratch)
                temp, stag = next(it), next(it)
                kbuf = k_ref if self._k_resident else next(it)
                outb = next(it)
                skip_stag = next(it) if has_skip else None
                skip_outb = next(it) if has_skip else None
                w_stag = next(it) if has_w else None
                insem, outsem = next(it), next(it)
                sksem = next(it) if has_skip else None
                sosem = next(it) if has_skip else None
                wsem = next(it) if has_w else None
                if self._k_resident:
                    cp = None
                else:
                    cp = pltpu.make_async_copy(k_ref, kbuf, ksem)
                    cp.start()

                # q_in consumers read the producer-quantized int8 twin
                src = bufq[st.src] if st.q_in else buf[st.src]

                def in_dma(slot, i):
                    w0 = i * th + st.lo_y
                    s = jnp.clip(w0, 0, hp - rows)
                    return pltpu.make_async_copy(
                        src.at[pl.ds(s, rows), :, pl.ds(0, st.cin)]
                        if st.src != "content" else src.at[pl.ds(s, rows)],
                        stag.at[slot], insem.at[slot])

                def skip_dma(slot, i):
                    w0 = i * th + st.lo_y
                    s = jnp.clip(w0, 0, hp - rows)
                    return pltpu.make_async_copy(
                        buf[st.skip_in].at[pl.ds(s, rows)],
                        skip_stag.at[slot], sksem.at[slot])

                def w_dma(slot, i):
                    # same clamped row window as in_dma: the weight map blends
                    # the halo rows too (they are real activations here)
                    w0 = i * th + st.lo_y
                    s = jnp.clip(w0, 0, hp - rows)
                    return pltpu.make_async_copy(
                        buf[st.w_src].at[pl.ds(s, rows), :, pl.ds(0, st.cin)],
                        w_stag.at[slot], wsem.at[slot])

                def out_dma(slot, i):
                    dst = bufq[st.dst] if st.q_out_si >= 0 else buf[st.dst]
                    return pltpu.make_async_copy(
                        outb.at[slot],
                        dst.at[pl.ds(i * ob_rows, ob_rows), :,
                               pl.ds(st.dst_c0, ob_c)],
                        outsem.at[slot])

                def skip_out_dma(slot, i):
                    return pltpu.make_async_copy(
                        skip_outb.at[slot],
                        buf[st.skip_out].at[pl.ds(i * th, th)],
                        sosem.at[slot])

                # warm-up: first band's loads in flight before the loop
                in_dma(0, 0).start()
                if st.skip_in is not None:
                    skip_dma(0, 0).start()
                if has_w:
                    w_dma(0, 0).start()
                if cp is not None:
                    cp.wait()

                def band(i, _):
                    slot = i % 2
                    nxt = (i + 1) % 2

                    @pl.when(i + 1 < nb)
                    def _():
                        in_dma(nxt, i + 1).start()

                    if st.skip_in is not None:
                        @pl.when(i + 1 < nb)
                        def _():
                            skip_dma(nxt, i + 1).start()

                    if has_w:
                        @pl.when(i + 1 < nb)
                        def _():
                            w_dma(nxt, i + 1).start()

                    in_dma(slot, i).wait()

                    if has_transform:
                        # bf16 elementwise chain: every op here is a full VMEM
                        # pass over the band, so halving the element size is a
                        # direct VPU-traffic win; the downstream matmul eats
                        # bf16 anyway (the XLA packed path also runs these
                        # affines in the compute dtype).
                        x = stag[slot]
                        if st.in_affine:
                            a = affine_sc[0:1, :st.cin].reshape(
                                1, 1, st.cin).astype(jnp.bfloat16)
                            b = affine_sc[1:2, :st.cin].reshape(
                                1, 1, st.cin).astype(jnp.bfloat16)
                            if has_w or w_resident or w_vmem:
                                da = affine_sc[2:3, :st.cin].reshape(
                                    1, 1, st.cin).astype(jnp.bfloat16)
                                db = affine_sc[3:4, :st.cin].reshape(
                                    1, 1, st.cin).astype(jnp.bfloat16)
                                if w_resident:
                                    # Same clamped window as in_dma so halo
                                    # rows blend with their true weights.  2D
                                    # VMEM tiles sublanes: load an 8-aligned
                                    # window, roll the misalignment away,
                                    # then lane-insert to broadcast.
                                    w0 = i * th + st.lo_y
                                    s = jnp.clip(w0, 0, hp - rows)
                                    win = min(_round_up(rows + 7, 8), hp)
                                    s8 = jnp.minimum((s // 8) * 8, hp - win)
                                    ww = buf["wB"][
                                        pl.ds(pl.multiple_of(s8, 8), win)]
                                    wv = pltpu.roll(ww, s8 - s, 0)[
                                        0:rows][:, :, None].astype(
                                        jnp.bfloat16)
                                elif w_vmem:
                                    # expand mip resident in VMEM: read the
                                    # clamped band window directly (first dim
                                    # is untiled, so the traced offset is
                                    # fine) — no DMA ring at all
                                    w0 = i * th + st.lo_y
                                    s = jnp.clip(w0, 0, hp - rows)
                                    wv = buf[st.w_src][
                                        pl.ds(s, rows), :, pl.ds(0, st.cin)]
                                else:
                                    w_dma(slot, i).wait()
                                    wv = w_stag[slot]
                                x = (x * a + b) + wv * (x * da + db)
                            else:
                                x = x * a + b
                        if st.in_relu:
                            x = jnp.maximum(x, jnp.bfloat16(0.0))
                        if st.skip_in is not None:
                            skip_dma(slot, i).wait()
                            x = x + skip_stag[slot]
                        xt = x
                    else:
                        xt = stag[slot]

                    if calibrate:
                        # per-channel max over the exact matmul input (incl.
                        # the clamped halo rows, which are real activations)
                        xf = jnp.abs(xt.astype(jnp.float32))
                        m = jnp.max(xf, axis=(0, 1))
                        cal_sc[0:1, :st.cin] = jnp.maximum(
                            cal_sc[0:1, :st.cin], m[None, :])
                        if check:
                            # count the elements the quant engine would clip
                            # at ±127 under the GIVEN scales.  Bands quantize
                            # their halo rows too, so this is the deploy
                            # engine's clip-EVENT count (an element in two
                            # bands' windows is quantized — and counted —
                            # twice, matching what the int8 kernel executes).
                            # Threshold 127.5: below it rint() lands on <=127
                            # anyway (no information loss), and it absorbs the
                            # f32 rounding of 127/s on the max element itself.
                            inv = check_inv_tbl[si:si + 1, :st.cin].reshape(
                                1, 1, st.cin)
                            over = (xf * inv > 127.5).astype(jnp.float32)
                            cal_sc[1:2, :st.cin] += jnp.sum(
                                over, axis=(0, 1))[None, :]
                    if st.q_in:
                        # the producer already quantized this edge with OUR
                        # act_inv row — the band is int8 on arrival
                        xt_q = xt
                    elif self.quant:
                        # static per-stage per-channel scales: quantize in
                        # the same pass that staged into temp before (f32
                        # mul for rounding headroom)
                        inv = act_inv_tbl[si:si + 1, :st.cin].reshape(
                            1, 1, st.cin)
                        xt_q = jnp.clip(
                            jnp.rint(xt.astype(jnp.float32) * inv),
                            -127.0, 127.0).astype(jnp.int8)
                    else:
                        xt_q = xt

                    if st.skip_out is not None:
                        # wait for the DMA that used this ring slot 2 bands ago
                        @pl.when(i >= 2)
                        def _():
                            skip_out_dma(slot, i - 2).wait()
                        # owned rows sit at staging offset first_shift for
                        # middle bands, 0 when the top halo was clamped away,
                        # rows-th when the bottom halo was.
                        skip_outb[slot] = xt[first_shift:first_shift + th]
                        @pl.when(i == 0)
                        def _():
                            skip_outb[slot] = xt[0:th]
                        @pl.when(i == nb - 1)
                        def _():
                            skip_outb[slot] = xt[rows - th:rows]
                        skip_out_dma(slot, i).start()

                    # temp's halo cols/rows are zeroed once per stage (before
                    # the loop); bands overwrite only the content columns.
                    xw = -st.lo_x  # content column offset in temp

                    if first_shift == 0 and last_shift == 0:
                        temp[pl.ds(0, rows), xw:xw + wp, :] = xt_q
                    else:
                        @pl.when(jnp.logical_and(i > 0, i < nb - 1))
                        def _():
                            temp[pl.ds(0, rows), xw:xw + wp, :] = xt_q
                        @pl.when(i == 0)
                        def _():
                            temp[pl.ds(first_shift, rows - first_shift),
                                 xw:xw + wp, :] = xt_q[
                                0:rows - first_shift]
                        @pl.when(i == nb - 1)
                        def _():
                            temp[pl.ds(0, rows - last_shift),
                                 xw:xw + wp, :] = xt_q[
                                last_shift:rows]
                            # rows above were band nb-2's content: they are
                            # this band's bottom halo and must be zero
                            temp[pl.ds(rows - last_shift, last_shift),
                                 xw:xw + wp, :] = jnp.zeros(
                                (last_shift, wp, st.cin), temp.dtype)

                    # dx-major tap matmuls: one W-shifted slab copy per dx
                    # (contiguous in (row, W)), then dy slices reshape for
                    # free; structurally-zero taps and cin chunks are skipped
                    taps = self._taps[si]
                    acc_dt = jnp.int32 if self.quant else jnp.float32
                    acc = jnp.zeros((th * wp, st.cout), acc_dt)
                    for dx in sorted(set(d for _, d in taps)):
                        slab = temp[:, dx:dx + wp, :]
                        for dy in range(st.ph):
                            if (dy, dx) not in taps:
                                continue
                            patch = slab[dy:dy + th].reshape(th * wp, st.cin)
                            for c0, c1 in taps[(dy, dx)]:
                                acc += jnp.dot(
                                    patch[:, c0:c1], kbuf[dy, dx, c0:c1],
                                    preferred_element_type=acc_dt)
                    if self.quant:
                        # exact int32 sum -> f32 via the folded (s_x*s_w/127)
                        # per-cout dequant row; epilogue below is unchanged
                        acc = acc.astype(jnp.float32) * \
                            dequant_tbl[si:si + 1, :st.cout]
                    bias = bias_tbl[si:si + 1, :st.cout]
                    if st.epi == "contract":
                        acc = jnp.maximum(acc + bias, 0.0)
                        cs = contract_tbl[si, 0:1, :st.cout]
                        cb = contract_tbl[si, 1:2, :st.cout]
                        acc = jnp.maximum(acc * cs + cb, 0.0)
                    elif st.epi == "relu":
                        acc = jnp.maximum(acc + bias, 0.0)
                    else:  # 'bias'
                        acc = acc + bias
                    if st.stats:
                        # moments from the f32 accumulator directly: skips the
                        # bf16->f32 re-expansion pass and is closer to the
                        # oracle's f32 moment math than rounding first
                        stats_sc[0:1, :st.cout] += jnp.sum(
                            acc, axis=0, keepdims=True)
                        stats_sc[1:2, :st.cout] += jnp.sum(
                            acc * acc, axis=0, keepdims=True)
                    if st.q_out_si >= 0:
                        # producer-quantized edge: quantize the f32 epilogue
                        # output with the CONSUMER's act_inv row (same values
                        # the consumer's in-band quantize would produce,
                        # minus the bf16 round-trip) and ship int8
                        qinv = act_inv_tbl[
                            st.q_out_si:st.q_out_si + 1,
                            st.dst_c0:st.dst_c0 + st.cout]
                        outv = jnp.clip(jnp.rint(acc * qinv),
                                        -127.0, 127.0).astype(jnp.int8)
                    else:
                        outv = acc.astype(jnp.bfloat16)

                    @pl.when(i >= 2)
                    def _():
                        out_dma(slot, i - 2).wait()

                    if st.repack == "fold2":
                        # two content-grid rows -> one bottleneck row: fold
                        # column pairs into lanes (free row-major reshape),
                        # then de-interleave row parities into channel blocks
                        # (the reshape+index form that lowers in Mosaic —
                        # tools/probe_repack_ops.py)
                        r = outv.reshape(th // 2, 2, ob_wp, 2 * st.cout)
                        outb[slot] = jnp.concatenate([r[:, 0], r[:, 1]], -1)
                    elif st.repack == "unfold2":
                        # bottleneck f4 -> content-grid f2, decomposed into
                        # the two casts Mosaic lowers (probed on the v5e —
                        # the one-shot stack+reshape is rejected with
                        # "unsupported shape cast"): (1) a sublane row
                        # interleave with the lane dim unchanged
                        # (stack + reshape), then (2) a lane->column unfold
                        # cast, with each column-parity block pre-padded to
                        # ob_c lanes so the cast lands on (2th, 2wp, ob_c).
                        ov = outv.reshape(th, wp, st.cout)
                        half = st.cout // 2
                        q = half // 2  # per-column-parity f2 channels
                        z = jnp.stack([ov[:, :, :half], ov[:, :, half:]],
                                      axis=1).reshape(2 * th, wp, half)
                        pad = jnp.zeros((2 * th, wp, ob_c - q), z.dtype)
                        zp = jnp.concatenate(
                            [z[:, :, :q], pad, z[:, :, q:], pad], axis=-1)
                        outb[slot] = zp.reshape(2 * th, 2 * wp, ob_c)
                    else:
                        outb[slot] = outv.reshape(th, wp, st.cout)
                    out_dma(slot, i).start()
                    return 0

                if st.stats:
                    stats_sc[...] = jnp.zeros_like(stats_sc)
                if calibrate:
                    cal_sc[...] = jnp.zeros_like(cal_sc)
                # Halo-only zeroing: bands overwrite the content columns
                # [xw0, xw0+wp) every iteration (band 0 additionally needs a
                # zero top halo; the last band re-zeroes its bottom halo
                # in-loop), so only the side column strips and the top rows
                # need clearing — ~30x less VPU traffic than a full memset.
                xw0 = -st.lo_x
                if xw0 > 0:
                    temp[:, 0:xw0, :] = jnp.zeros(
                        (rows, xw0, st.cin), temp.dtype)
                if wpad > xw0 + wp:
                    temp[:, xw0 + wp:wpad, :] = jnp.zeros(
                        (rows, wpad - xw0 - wp, st.cin), temp.dtype)
                if first_shift > 0:
                    temp[0:first_shift, xw0:xw0 + wp, :] = jnp.zeros(
                        (first_shift, wp, st.cin), temp.dtype)
                jax.lax.fori_loop(0, nb, band, 0)
                # drain the last two in-flight output DMAs (nb >= 2)
                out_dma((nb - 2) % 2, nb - 2).wait()
                out_dma((nb - 1) % 2, nb - 1).wait()
                if st.skip_out is not None:
                    skip_out_dma((nb - 2) % 2, nb - 2).wait()
                    skip_out_dma((nb - 1) % 2, nb - 1).wait()

                if calibrate:
                    if check:
                        cal_out[pl.ds(2 * si, 2), :] = cal_sc[...]
                    else:
                        cal_out[pl.ds(si, 1), :] = cal_sc[0:1, :]

                if st.stats:
                    fold_cin_affine(st)

            mm_dt = jnp.int8 if self.quant else jnp.bfloat16
            scratch = [
                pltpu.VMEM((rows, wpad, st.cin), mm_dt),
                # q_in: the band arrives already int8 (producer-quantized)
                pltpu.VMEM((2, rows, wp, st.cin),
                           jnp.int8 if st.q_in else jnp.bfloat16),
            ] + ([] if self._k_resident else [
                pltpu.VMEM(self._kernels[si].shape, mm_dt),
            ]) + [
                pltpu.VMEM((2, ob_rows, ob_wp, ob_c),
                           jnp.int8 if st.q_out_si >= 0 else jnp.bfloat16),
            ]
            if has_skip:
                scratch += [
                    pltpu.VMEM((2, rows, wp, LANE), jnp.bfloat16),
                    pltpu.VMEM((2, th, wp, LANE), jnp.bfloat16),
                ]
            if has_w:
                scratch += [pltpu.VMEM((2, rows, wp, st.cin), jnp.bfloat16)]
            scratch += [
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ]
            if has_skip:
                scratch += [
                    pltpu.SemaphoreType.DMA((2,)),
                    pltpu.SemaphoreType.DMA((2,)),
                ]
            if has_w:
                scratch += [pltpu.SemaphoreType.DMA((2,))]
            pl.run_scoped(body, *scratch)

        def run_pointwise(st: _Stage):
            hp, wp = st.hp, st.wp
            th = max(t for t in (8, 4, 2, 1) if hp % t == 0)
            nb = hp // th
            has_w = self.dual and st.in_affine and st.w_src is not None
            w_vmem = has_w and self._w_all_resident  # wFin resident in VMEM
            has_w = has_w and not w_vmem

            def body(*scratch):
                it = iter(scratch)
                stag, outb = next(it), next(it)
                w_stag = next(it) if has_w else None
                insem, outsem = next(it), next(it)
                wsem = next(it) if has_w else None

                # double-buffered in/out rings: the r3 bisect priced this
                # stage at 0.061 ms with fully serialized DMAs; overlapping
                # band i+1's load and band i-2's drain under band i's VPU
                # work removes most of it
                def in_dma(slot, i):
                    return pltpu.make_async_copy(
                        buf[st.src].at[pl.ds(i * th, th), :, pl.ds(0, LANE)],
                        stag.at[slot], insem.at[slot])

                def w_dma(slot, i):
                    return pltpu.make_async_copy(
                        buf[st.w_src].at[pl.ds(i * th, th)],
                        w_stag.at[slot], wsem.at[slot])

                def out_dma(slot, i):
                    return pltpu.make_async_copy(
                        outb.at[slot], buf[st.dst].at[pl.ds(i * th, th)],
                        outsem.at[slot])

                in_dma(0, 0).start()
                if has_w:
                    w_dma(0, 0).start()

                def band(i, _):
                    slot = i % 2
                    nxt = (i + 1) % 2

                    @pl.when(i + 1 < nb)
                    def _():
                        in_dma(nxt, i + 1).start()

                    if has_w:
                        @pl.when(i + 1 < nb)
                        def _():
                            w_dma(nxt, i + 1).start()
                        w_dma(slot, i).wait()
                    in_dma(slot, i).wait()
                    # affine in bf16; sigmoid stays f32 (Mosaic cannot lower
                    # bf16 logistic: f32 scalar broadcast verification error)
                    x = stag[slot]
                    a = affine_sc[0:1, :LANE].reshape(
                        1, 1, LANE).astype(jnp.bfloat16)
                    b = affine_sc[1:2, :LANE].reshape(
                        1, 1, LANE).astype(jnp.bfloat16)
                    xb = x * a + b
                    if has_w or w_vmem:
                        da = affine_sc[2:3, :LANE].reshape(
                            1, 1, LANE).astype(jnp.bfloat16)
                        db = affine_sc[3:4, :LANE].reshape(
                            1, 1, LANE).astype(jnp.bfloat16)
                        wv = (buf[st.w_src][pl.ds(i * th, th), :,
                                            pl.ds(0, LANE)]
                              if w_vmem else w_stag[slot])
                        xb = xb + wv * (x * da + db)
                    y = xb.astype(jnp.float32)

                    @pl.when(i >= 2)
                    def _():
                        out_dma(slot, i - 2).wait()

                    outb[slot] = jax.nn.sigmoid(y).astype(jnp.bfloat16)
                    out_dma(slot, i).start()
                    return 0

                jax.lax.fori_loop(0, nb, band, 0)
                # drain the last two in-flight output DMAs (nb >= 2)
                out_dma((nb - 2) % 2, nb - 2).wait()
                out_dma((nb - 1) % 2, nb - 1).wait()

            scratch = [
                pltpu.VMEM((2, th, wp, LANE), jnp.bfloat16),
                pltpu.VMEM((2, th, wp, LANE), jnp.bfloat16),
            ]
            if has_w:
                scratch += [pltpu.VMEM((2, th, wp, LANE), jnp.bfloat16)]
            scratch += [
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ]
            if has_w:
                scratch += [pltpu.SemaphoreType.DMA((2,))]
            pl.run_scoped(body, *scratch)

        ki = 0
        stages = self.stages
        if self.debug_stages is not None:
            stages = stages[:self.debug_stages]
        for si, st in enumerate(stages):
            if st.kind == "conv":
                if (self._direct_ok(st) and not calibrate and not check):
                    run_conv_direct(si, st, kernel_refs[ki])
                else:
                    run_conv(si, st, kernel_refs[ki])
                ki += 1
            else:
                run_pointwise(st)

    # ---- jitted forward -----------------------------------------------------

    def _weight_maps(self, style_weights):
        """Per-pixel style-1 weight, packed to the uniform grid and expanded
        to each consumer stage's padded packed channel count (HBM inputs).

        ``wB`` blends the bottleneck-resolution CINs (res core + e0 input),
        ``wE0``/``wE1`` the expand CINs, ``wFin`` the final sigmoid CIN —
        matching the reference's width-keyed mip pyramid
        (``styleTransfer.py:335-345``).
        """
        from ...ops.image_ops import style_weight_mips
        from ...ops.style_params import concat_implicit_weight
        from ..packed_conv import pack

        hp, wp = self.hp, self.wp
        plan = self.plan
        filters = plan.bottleneck_num_filters
        e0_f = plan.expand_blocks[0][0]
        e1_f = plan.expand_blocks[1][0]
        fin_f = plan.expand_blocks[2][0]

        full = concat_implicit_weight(style_weights.astype(jnp.float32))
        mips = style_weight_mips(full, plan.num_mips)

        def expand(w_packed, c):
            rep = jnp.repeat(w_packed, c, axis=-1)
            pad = _round_up(rep.shape[-1], LANE) - rep.shape[-1]
            out = jnp.pad(rep, ((0, 0), (0, 0), (0, 0), (0, pad)))
            return out[0].astype(jnp.bfloat16)

        w_b = mips[wp][..., 1:2]                      # (1, hp, wp, 1)
        w_e0 = pack(mips[2 * wp][..., 1:2], 2)        # (1, hp, wp, 4)
        w_hi = pack(mips[4 * wp][..., 1:2], 4)        # (1, hp, wp, 16)
        if self._wb_resident:
            # compact f32 2D plane: VMEM-resident, broadcast in-kernel
            wb = w_b[0, :, :, 0].astype(jnp.float32)
        else:
            wb = expand(w_b, _round_up(filters, LANE))
        return (
            wb,                                       # res core + e0 input
            expand(w_e0, e0_f),                       # e1 input (4*e0_f ch)
            expand(w_hi, e1_f),                       # final input (16*e1_f)
            expand(w_hi, fin_f),                      # finish (16*fin_f ch)
        )

    def _prepare(self, style_params, style_weights=None):
        """Per-style device constants: the tiled scale/bias table and (dual)
        the packed weight-mip inputs.  Loop-invariant across a frame stream —
        compute once via :meth:`prepare_style` (the reference's video loop
        precomputes style params the same way,
        ``predict_video_using_checkpoint.py:77-80``)."""
        style_tbl = self._style_table(style_params)
        w_inputs = ()
        if self.dual:
            if style_weights is None:
                raise ValueError("style_weights required for dual-style")
            w_inputs = self._weight_maps(style_weights)
        return (style_tbl,) + tuple(w_inputs)

    def _forward_raw(self, content, style_params, style_weights=None):
        """All kernel outputs (out, actA, actB, skipA, skipB) — debug/bisect."""
        return self._run_raw(
            content, self._prepare(style_params, style_weights))

    def pack_frame(self, content: jnp.ndarray) -> jnp.ndarray:
        """(1, H, W, C) f32 -> the kernel's packed input (hp, wp, Cp) bf16.

        The deploy path packs at the source (engine G-buffer copy-out / the
        DevicePrefetcher worker) so the per-frame device graph is pack-free —
        r2's bisect priced the in-XLA pack at ~0.15 ms/frame.
        """
        from ..packed_conv import pack

        p = pack(content.astype(jnp.bfloat16), 4)  # (1, hp, wp, 16*C)
        c_packed = p.shape[-1]
        c_pad = _round_up(c_packed, LANE)
        return jnp.pad(p, ((0, 0), (0, 0), (0, 0), (0, c_pad - c_packed)))[0]

    def pack_frame_np(self, content: np.ndarray) -> np.ndarray:
        """Host (numpy) twin of :meth:`pack_frame` for the data plane.

        Space-to-depth f4 ((1, H, W, C) -> (hp, wp, 16*C) zero-padded to a
        lane multiple), producing the same ``ml_dtypes.bfloat16`` values the
        device pack would — so a DevicePrefetcher worker can ship pack-free
        frames (equality asserted in ``tests/test_fused_transfer.py``).
        """
        import ml_dtypes

        x = np.asarray(content, np.float32)
        n, h, w, c = x.shape
        assert n == 1, "pack one frame at a time"
        f = 4
        hp, wp = h // f, w // f
        # (1, hp, f, wp, f, c) -> (hp, wp, f, f, c): subpixel-major channels,
        # matching ops.packed_conv.pack (dy, dx, c) order.
        y = x.reshape(hp, f, wp, f, c).transpose(0, 2, 1, 3, 4)
        y = y.reshape(hp, wp, f * f * c)
        c_pad = _round_up(f * f * c, LANE)
        out = np.zeros((hp, wp, c_pad), ml_dtypes.bfloat16)
        out[:, :, : f * f * c] = y.astype(ml_dtypes.bfloat16)
        return out

    def calibrate_act_scales(self, packed_frames, prepared) -> np.ndarray:
        """Per-stage per-channel activation maxima for int8 PTQ.

        Runs the kernel itself in a calibration mode that records, per conv
        stage and input channel, the max |x| of the exact matmul input (post
        CIN-affine/relu/skip, pre-quantization) — so the scales correspond
        one-to-one to what ``quant='int8'`` will quantize.
        ``packed_frames``: iterable of pre-packed frames
        (:meth:`pack_frame`).  Returns ``(n_conv_stages, ACT_C)`` float32 to
        pass as ``act_scales`` when rebuilding with ``quant='int8'``.  Run
        on the bf16 engine (quant engines refuse).

        The scales are per (checkpoint, style), not per checkpoint: the
        maxima are captured AFTER the CIN affine, whose scale/bias come from
        ``prepared``.  Deploying the quant engine with a different style
        table than the one calibrated against can saturate the ±127 clip
        and silently degrade output.  For a multi-style deploy, call once
        per style table and ``np.maximum`` the results (maxima compose
        conservatively).
        """
        if self.quant:
            raise ValueError("calibrate on the bf16 engine, not a quant one")
        if self._jitted_calibrate is None:
            n_rows = _round_up(len(self.stages), 8)
            out_shapes = self._act_out_shapes(self.hp, self.wp) + (
                jax.ShapeDtypeStruct((n_rows, ACT_C), jnp.float32),)
            self._jitted_calibrate = jax.jit(lambda p, prep: self._launch(
                self._kernel_fn_calibrate, p, prep, out_shapes,
                calibrate=True)[-1])
        mx = None
        for p in packed_frames:
            m = np.asarray(self._jitted_calibrate(p, prepared))
            mx = m if mx is None else np.maximum(mx, m)
        if mx is None:
            raise ValueError("need at least one calibration frame")
        return mx[:len(self._kernels)].astype(np.float32)

    def _act_inv_rows(self, scales: np.ndarray) -> np.ndarray:
        """Per-stage ``127/s_c`` quantization rows (the int8 engine's
        ``act_inv`` table) for the given activation scales."""
        scales = np.asarray(scales, np.float32)
        rows = np.zeros((len(self._kernels), ACT_C), np.float32)
        for i, k in enumerate(self._kernels):
            cin = k.shape[2]
            rows[i, :cin] = 127.0 / np.maximum(scales[i, :cin], 1e-6)
        return rows

    def check_act_saturation(self, packed_frames, prepared, act_scales):
        """Measure how hard the GIVEN int8 scales would clip on these frames.

        The deploy guard for the per-(checkpoint, style) scale contract (see
        :meth:`calibrate_act_scales`): runs the calibration kernel mode with
        the scales-under-test and counts, per conv stage, the elements the
        int8 engine would saturate at ±127.  The counting runs under the
        CHECK-mode band tiling, whose ``_pick_th`` budgets differ from the
        deploy int8 engine's, so the per-band halo re-quantize tallies (and
        hence ``n_quantized``) are close to but not bit-equal to the deploy
        launch; the clip *fraction* and ``max_ratio`` are what the guard
        thresholds read and are tiling-independent in practice.  Run on the
        bf16 engine with the DEPLOY style table in ``prepared``.

        Returns a list of per-conv-stage dicts:
        ``{"stage", "max_ratio", "clip_events", "n_quantized"}`` where
        ``max_ratio`` is ``max_c(max|x|_c / scale_c)`` (1.0 = the scale is
        exactly the observed max; >1 clips) and ``clip_events/n_quantized``
        is the clip fraction of all quantize events across the frames.
        """
        if self.quant:
            raise ValueError("check saturation on the bf16 engine, "
                             "not a quant one")
        scales = np.asarray(act_scales, np.float32)
        if scales.shape != (len(self._kernels), ACT_C):
            raise ValueError(
                f"act_scales must be ({len(self._kernels)}, {ACT_C}); got "
                f"{scales.shape}")
        inv_tbl = jnp.asarray(self._act_inv_rows(scales))
        n_rows = _round_up(2 * len(self.stages), 8)
        out_shapes = self._act_out_shapes(self.hp, self.wp) + (
            jax.ShapeDtypeStruct((n_rows, ACT_C), jnp.float32),)
        jitted = jax.jit(lambda p, prep, inv: self._launch(
            self._kernel_fn_check, p, prep, out_shapes, calibrate=True,
            extra_tables=(inv,))[-1])
        n_k = len(self._kernels)
        mx = counts = None
        n_frames = 0
        for p in packed_frames:
            m = np.asarray(jitted(p, prepared, inv_tbl))
            maxima, clips = m[0::2][:n_k], m[1::2][:n_k]
            mx = maxima if mx is None else np.maximum(mx, maxima)
            counts = clips if counts is None else counts + clips
            n_frames += 1
        if n_frames == 0:
            raise ValueError("need at least one frame to check")
        report = []
        conv_stages = [st for st in self.stages if st.kind == "conv"]
        for i, st in enumerate(conv_stages):
            th = self._pick_th(i, st, calibrate=True, check=True)
            rows = th + st.ph - 1
            n_elems = (st.hp // th) * rows * st.wp * st.cin * n_frames
            ratio = float(np.max(
                mx[i, :st.cin] / np.maximum(scales[i, :st.cin], 1e-6)))
            report.append({
                "stage": st.name,
                "max_ratio": ratio,
                "clip_events": int(counts[i].sum()),
                "n_quantized": int(n_elems),
            })
        return report

    def stylize_prepacked(self, packed: jnp.ndarray, prepared) -> jnp.ndarray:
        """Per-frame call on a pre-packed frame (see :meth:`pack_frame`)."""
        return self._jitted_prepacked(packed, prepared)

    def stylize_prepacked_raw(self, packed: jnp.ndarray, prepared) -> jnp.ndarray:
        """Fully-packed deploy loop: pre-packed frame in, PACKED frame out.

        Returns the kernel's own ``(hp, wp, LANE)`` bf16 output buffer with no
        device-side unpack (zero post-processing in the per-frame graph; the
        first ``16 * fin_filters`` channels are the stylized subpixels in
        ``pack`` order — a consumer-side shader/host unpacks via
        :meth:`unpack_frame_np`).  Pair with :meth:`pack_frame_np` at the
        source for a per-frame graph that is exactly one kernel launch.
        """
        return self._jitted_prepacked_raw(packed, prepared)

    def unpack_frame_np(self, packed_out: np.ndarray) -> np.ndarray:
        """Host (numpy) twin of the device output unpack.

        ``(hp, wp, >=16*fin_f)`` bf16/float -> ``(1, H, W, 3)`` f32, the same
        values :meth:`stylize_prepacked` returns (equality unit-tested) — the
        data-plane consumer for :meth:`stylize_prepacked_raw`.
        """
        fin_f = self.plan.expand_blocks[-1][0]
        x = np.asarray(packed_out[:, :, :16 * fin_f], np.float32)
        hp, wp = x.shape[:2]
        y = x.reshape(hp, wp, 4, 4, fin_f).transpose(0, 2, 1, 3, 4)
        return y.reshape(1, hp * 4, wp * 4, fin_f)

    def _w_specs(self, w_inputs):
        """Dual-style mip input specs: wB VMEM-resident (when the compact
        plane is usable); the expand-resolution mips VMEM-resident when
        ``_w_all_resident`` (r4 — the raised scoped-VMEM cap makes their
        ~30 MB affordable), else HBM-streamed rings."""
        if not w_inputs:
            return []
        wb_spec = pl.BlockSpec(
            memory_space=pltpu.VMEM
            if (self._wb_resident or self._wb_expanded) else pl.ANY)
        rest_space = pltpu.VMEM if self._w_all_resident else pl.ANY
        return ([wb_spec]
                + [pl.BlockSpec(memory_space=rest_space)]
                * (len(w_inputs) - 1))

    def _run_raw(self, content, prepared):
        return self._run_packed(self.pack_frame(content), prepared)

    def _act_out_shapes(self, hp, wp):
        """The kernel's HBM outputs (stylized + ping-pong + skips; the
        3-contract family appends the content-grid ping-pong pair)."""
        hs, ws = self.hp_s, self.wp_s
        shapes = (
            jax.ShapeDtypeStruct((hp, wp, LANE), jnp.bfloat16),   # out
            jax.ShapeDtypeStruct((hs, ws, ACT_C), jnp.bfloat16),  # actA
            jax.ShapeDtypeStruct((hs, ws, ACT_C), jnp.bfloat16),  # actB
            jax.ShapeDtypeStruct((hs, ws, LANE), jnp.bfloat16),   # skipA
            jax.ShapeDtypeStruct((hs, ws, LANE), jnp.bfloat16),   # skipB
        )
        if self.three_seg:
            shapes += (
                jax.ShapeDtypeStruct((hp, wp, ACT_C), jnp.bfloat16),  # actLA
                jax.ShapeDtypeStruct((hp, wp, ACT_C), jnp.bfloat16),  # actLB
            )
        if self._q_dsts:
            # int8 twins for the producer-quantized edges (_Q_EDGES): same
            # spatial shape as the bf16 buffer they shadow, half the bytes
            by_name = {"actA": (hs, ws), "actB": (hs, ws),
                       "actLA": (hp, wp), "actLB": (hp, wp)}
            shapes += tuple(
                jax.ShapeDtypeStruct(by_name[n] + (ACT_C,), jnp.int8)
                for n in self._q_dsts)
        return shapes

    def _launch(self, kernel_fn, p, prepared, out_shapes, *, grid=None,
                calibrate=False, extra_tables=()):
        """Shared ``pallas_call`` builder for the single-frame and chunk
        launches — one place for the in/out specs, scratch, and operands."""
        style_tbl, *w_inputs = prepared
        kwargs = {}
        # The band budgets (_pick_th) are tuned against XLA's default 16 MB
        # scoped-VMEM limit, but that limit also charges whatever ELSE the
        # surrounding program stack-allocates in VMEM alongside the kernel —
        # here the ~0.5 MB of VMEM-blockspec style tables.  Inside a jitted
        # frame loop they are hoisted loop constants and the kernel fits; in
        # a standalone jit (video CLI per-frame call, calibration) they land
        # on the same stack and tripped the limit by ~356 KB (r3, real TPU).
        # The v5e physically has 128 MB of VMEM — raise the cap by 2 MB so
        # the tuned schedules keep compiling regardless of the caller's
        # program shape instead of re-tuning every budget 0.5 MB down.
        vmem_bytes = int(_VMEM_CAP_MB * 2 ** 20)
        if self._k_resident:
            # resident kernels charge the scoped-VMEM stack like the resident
            # weight mips; the per-stage kbuf charge in _pick_th is left in
            # place so band heights (and the A/B's HLO modulo the copies)
            # stay comparable
            vmem_bytes += sum(
                int(np.prod(k.shape)) * k.dtype.itemsize
                for k in self._kernels)
        if w_inputs and (self._w_all_resident or self._wb_expanded):
            # resident weight-mip inputs charge the same scoped-VMEM stack as
            # kernel scratch (finding 9); keep the stage headroom constant
            # above them
            resident = (w_inputs if self._w_all_resident else w_inputs[:1])
            vmem_bytes += sum(
                int(np.prod(w.shape)) * w.dtype.itemsize for w in resident)
        vmem_cap = dict(vmem_limit_bytes=vmem_bytes)
        if grid is not None:
            kwargs["grid"] = grid
            kwargs["compiler_params"] = pltpu.CompilerParams(
                has_side_effects=True, dimension_semantics=("arbitrary",),
                **vmem_cap)
        else:
            kwargs["compiler_params"] = pltpu.CompilerParams(
                has_side_effects=True, **vmem_cap)
        tables = [self._biases, self._contract, style_tbl] + [
            self._g_jnp[n] for n in self._g]
        if self.quant:
            tables += [self._dequant, self._act_inv]
        tables += list(extra_tables)
        out_specs = [pl.BlockSpec(memory_space=pl.ANY) for _ in out_shapes]
        scratch = [
            pltpu.VMEM((2, STATS_C), jnp.float32),   # stats
            pltpu.VMEM((4, STATS_C), jnp.float32),   # affine (+ deltas)
            pltpu.SemaphoreType.DMA(()),             # ksem: kernel copies
        ]
        if calibrate:
            # the per-stage act-max output rides in VMEM (tiny) so stages
            # can store rows directly; row 1 carries the saturation-check
            # clip counts (unused in plain calibration)
            out_specs[-1] = pl.BlockSpec(memory_space=pltpu.VMEM)
            scratch.append(pltpu.VMEM((2, ACT_C), jnp.float32))
        return pl.pallas_call(
            kernel_fn,
            in_specs=(
                [pl.BlockSpec(memory_space=pl.ANY)]
                + [pl.BlockSpec(
                    memory_space=pltpu.VMEM if self._k_resident else pl.ANY)]
                * len(self._kernels)
                + [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(tables)
                + self._w_specs(w_inputs)
            ),
            out_specs=tuple(out_specs),
            out_shape=out_shapes,
            scratch_shapes=scratch,
            interpret=self.interpret,
            **kwargs,
        )(p, *self._kernels, *tables, *w_inputs)

    def _run_packed(self, p, prepared):
        return self._launch(
            self._kernel_fn, p, prepared,
            self._act_out_shapes(self.hp, self.wp))

    def _run_packed_chunk(self, p, prepared):
        """N pre-packed frames through ONE kernel launch (grid=(N,)).

        Dispatch-amortization mode: frames are independent; the grid iterates
        them sequentially on the core, reusing the activation ping-pong
        buffers, so ONE host dispatch covers N frames.  On-chip FPS is
        measured IDENTICAL to the single-frame path (1.575 ms/frame at N=8
        and N=16 vs 1.573-1.578 single — the r2 bisect's ~0.09 ms "launch"
        line is per-grid-step setup, which a grid cannot amortize); the win
        is host-side only, relevant when each dispatch pays link RTT.
        Latency mode stays :meth:`_run_packed` (one frame per launch).
        """
        n, hp, wp = p.shape[0], self.hp, self.wp
        out, *rest = self._act_out_shapes(hp, wp)
        out_shapes = (
            jax.ShapeDtypeStruct((n,) + out.shape, out.dtype),) + tuple(rest)
        return self._launch(
            self._kernel_fn_chunked, p, prepared, out_shapes, grid=(n,))

    def stylize_prepacked_chunk(self, packed: jnp.ndarray, prepared):
        """(N, hp, wp, Cp) pre-packed frames -> (N, H, W, 3) in one launch."""
        return self._jitted_prepacked_chunk(packed, prepared)

    def _unpack_out(self, results):
        from ..packed_conv import unpack

        fin_f = self.plan.expand_blocks[-1][0]
        out = results[0][None, :, :, :16 * fin_f]
        return unpack(out, 4, fin_f).astype(jnp.float32)

    def _unpack_out_chunk(self, results):
        from ..packed_conv import unpack

        fin_f = self.plan.expand_blocks[-1][0]
        out = results[0][:, :, :, :16 * fin_f]  # (N, hp, wp, 16*fin_f)
        return unpack(out, 4, fin_f).astype(jnp.float32)

    def _forward(self, content, style_params, style_weights=None):
        return self._unpack_out(
            self._forward_raw(content, style_params, style_weights))

    def _forward_prepared(self, content, prepared):
        return self._unpack_out(self._run_raw(content, prepared))

    def prepare_style(self, style_params, style_weights=None):
        """Precompute the per-style kernel inputs for a frame stream."""
        if self.dual and style_weights is None:
            raise ValueError("style_weights required for dual-style")
        return self._jit_prepare(style_params, style_weights)

    def stylize_prepared(self, content: jnp.ndarray, prepared) -> jnp.ndarray:
        """Per-frame call with :meth:`prepare_style` output (streaming path:
        skips rebuilding the style table / weight mips every frame)."""
        if content.shape[0] != 1:
            raise ValueError("fused kernel runs batch 1 per call")
        return self._jitted_prepared(content, prepared)

    def __call__(self, content: jnp.ndarray, style_params: jnp.ndarray,
                 style_weights: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """content (1, H, W, C) f32; style_params (1, S, P) or (P,);
        style_weights (1, H, W, S-1) required when dual."""
        if content.shape[0] != 1:
            raise ValueError("fused kernel runs batch 1 per call")
        if self.dual:
            if style_weights is None:
                raise ValueError("style_weights required for dual-style")
            return self._jitted(content, style_params, style_weights)
        return self._jitted(content, style_params)
