"""First-party OpenEXR scanline *writer* (pure Python/numpy).

The reference ships no EXR writer — it only reads Unreal's dumps via pyroexr
(``/root/reference/realtime_style_transfer/dataloaders/hdrScreenshots.py:7``).
This framework needs one anyway: the test strategy (SURVEY §4) fabricates
G-buffer fixture sets offline instead of shipping engine dumps, and the writer
also round-trip-proves the native C++ decoder (``native/exr_decoder.cpp``).

Format support mirrors the decoder exactly: single-part scanline EXR 2.0,
INCREASING_Y, compressions NONE/RLE/ZIPS/ZIP, pixel types HALF/FLOAT.  The
RLE/ZIP pre-filter is OpenEXR's split-halves byte interleave followed by a
+128 delta predictor (see ``exr_decoder.cpp:exr_reorder`` for the inverse).
"""

from __future__ import annotations

import struct
import zlib
from pathlib import Path
from typing import Dict, Mapping, Optional, Sequence, Tuple

import numpy as np

PIXEL_TYPE_UINT = 0
PIXEL_TYPE_HALF = 1
PIXEL_TYPE_FLOAT = 2

_COMPRESSION_CODES = {"none": 0, "rle": 1, "zips": 2, "zip": 3}
_LINES_PER_BLOCK = {0: 1, 1: 1, 2: 1, 3: 16}

MAGIC = 20000630
VERSION = 2


def _attr(name: str, type_name: str, value: bytes) -> bytes:
    return (
        name.encode() + b"\0" + type_name.encode() + b"\0"
        + struct.pack("<i", len(value)) + value
    )


def _chlist(names: Sequence[str], pixel_type: int) -> bytes:
    out = b""
    for name in names:
        out += (
            name.encode() + b"\0"
            + struct.pack("<i", pixel_type)
            + b"\0\0\0\0"            # pLinear + 3 reserved
            + struct.pack("<ii", 1, 1)  # x/y sampling
        )
    return out + b"\0"


def _prefilter(raw: bytes) -> bytes:
    """OpenEXR RLE/ZIP pre-filter: interleave-split halves, then delta+128."""
    a = np.frombuffer(raw, np.uint8)
    split = np.concatenate([a[0::2], a[1::2]]).astype(np.int16)
    enc = split.copy()
    enc[1:] = split[1:] - split[:-1] + 128
    return enc.astype(np.uint8).tobytes()


def _rle_encode(data: bytes) -> bytes:
    """EXR RLE: count>=0 -> repeat next byte count+1; count<0 -> -count literals."""
    out = bytearray()
    i, n = 0, len(data)
    lit_start = i
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 3:
            while lit_start < i:  # flush pending literals
                chunk = min(127, i - lit_start)
                out.append(256 - chunk)  # two's complement of -chunk
                out += data[lit_start:lit_start + chunk]
                lit_start += chunk
            out.append(run - 1)
            out.append(data[i])
            i += run
            lit_start = i
        else:
            i += run
    while lit_start < i:
        chunk = min(127, i - lit_start)
        out.append(256 - chunk)
        out += data[lit_start:lit_start + chunk]
        lit_start += chunk
    return bytes(out)


def _compress_block(raw: bytes, code: int) -> bytes:
    """Compress one scanline block; store raw when it doesn't shrink.

    The stored-raw fallback is signalled by ``len == raw`` exactly as the
    decoder expects (``exr_decoder.cpp:decode_block``).
    """
    if code == 0:
        return raw
    filtered = _prefilter(raw)
    if code == 1:
        packed = _rle_encode(filtered)
    else:
        packed = zlib.compress(filtered)
    return packed if len(packed) < len(raw) else raw


def write_exr(
    path,
    channels: Mapping[str, np.ndarray],
    *,
    compression: str = "zip",
    pixel_type: int = PIXEL_TYPE_FLOAT,
) -> Path:
    """Write (h, w) float arrays as a scanline EXR the native decoder reads.

    Channels are stored in alphabetical order (the OpenEXR chlist contract);
    HALF data round-trips through float16.
    """
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    if compression not in _COMPRESSION_CODES:
        raise ValueError(
            f"compression must be one of {sorted(_COMPRESSION_CODES)}"
        )
    if pixel_type not in (PIXEL_TYPE_HALF, PIXEL_TYPE_FLOAT):
        raise ValueError("writer supports HALF and FLOAT pixel types")
    code = _COMPRESSION_CODES[compression]
    names = sorted(channels)
    if not names:
        raise ValueError("need at least one channel")
    arrays = [np.asarray(channels[n], np.float32) for n in names]
    h, w = arrays[0].shape
    for name, arr in zip(names, arrays):
        if arr.shape != (h, w):
            raise ValueError(f"channel {name}: shape {arr.shape} != {(h, w)}")
    if pixel_type == PIXEL_TYPE_HALF:
        planes = [a.astype(np.float16) for a in arrays]
    else:
        planes = arrays

    header = struct.pack("<II", MAGIC, VERSION)
    box = struct.pack("<iiii", 0, 0, w - 1, h - 1)
    header += _attr("channels", "chlist", _chlist(names, pixel_type))
    header += _attr("compression", "compression", bytes([code]))
    header += _attr("dataWindow", "box2i", box)
    header += _attr("displayWindow", "box2i", box)
    header += _attr("lineOrder", "lineOrder", b"\0")  # INCREASING_Y
    header += _attr("pixelAspectRatio", "float", struct.pack("<f", 1.0))
    header += _attr("screenWindowCenter", "v2f", struct.pack("<ff", 0.0, 0.0))
    header += _attr("screenWindowWidth", "float", struct.pack("<f", 1.0))
    header += b"\0"  # end of header

    lpb = _LINES_PER_BLOCK[code]
    num_blocks = (h + lpb - 1) // lpb

    chunks = []
    for b in range(num_blocks):
        y0 = b * lpb
        lines = min(lpb, h - y0)
        # block layout: per scanline, per channel (file order), width values
        raw = b"".join(
            plane[y].tobytes()
            for y in range(y0, y0 + lines)
            for plane in planes
        )
        data = _compress_block(raw, code)
        chunks.append(struct.pack("<ii", y0, len(data)) + data)

    offset = len(header) + 8 * num_blocks
    table = b""
    for chunk in chunks:
        table += struct.pack("<Q", offset)
        offset += len(chunk)

    with open(path, "wb") as f:
        f.write(header)
        f.write(table)
        for chunk in chunks:
            f.write(chunk)
    return path


def write_gbuffer_fixture(
    directory,
    stem: str,
    channels: Sequence[Tuple[str, int]],
    height: int,
    width: int,
    *,
    seed: int = 0,
    compression: str = "zip",
) -> Path:
    """Fabricate one Unreal-style screenshot set: ``<stem>.png`` + EXR siblings.

    Follows the engine dump convention the loaders expect
    (``hdrScreenshots.py:14-29``): for each configured channel group an EXR
    named ``<stem>_<Channel>.exr`` with R[,G,B] planes; the base PNG carries
    the FinalImage (the training ground truth).  Returns the PNG path.
    """
    import PIL.Image

    directory = Path(directory)
    directory.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    final_rgb: Optional[np.ndarray] = None
    for name, count in channels:
        data: Dict[str, np.ndarray] = {}
        plane_names = ("R", "G", "B")[:count] if count <= 3 else tuple(
            f"C{i}" for i in range(count)
        )
        for plane in plane_names:
            data[plane] = rng.random((height, width), np.float32).astype(
                np.float32
            )
        write_exr(
            directory / f"{stem}_{name}.exr", data, compression=compression
        )
        if name == "FinalImage" and count == 3:
            final_rgb = np.stack([data["R"], data["G"], data["B"]], axis=-1)
    if final_rgb is None:
        final_rgb = rng.random((height, width, 3), np.float32)
    png_path = directory / f"{stem}.png"
    PIL.Image.fromarray(
        (np.clip(final_rgb, 0.0, 1.0) * 255).astype(np.uint8)
    ).save(png_path)
    return png_path
