"""ctypes bindings for the native data-plane library (``native/librst_native.so``).

Three native components (first-party C++, built by ``make -C native``):

* EXR scanline decoder — replaces the reference's pyroexr dependency
  (``/root/reference/realtime_style_transfer/dataloaders/hdrScreenshots.py:7,18``)
* threaded G-buffer batch loader — decodes a screenshot's EXR set in parallel
  (the per-sample hot path of HDR training input)
* tensor-buffer reader/writer — the raw little-endian float32 stream the
  Unreal engine plugin exchanges with us
  (``/root/reference/realtime_style_transfer/dataloaders/tensorbuffer.py``)

The library is auto-built on first import when the ``.so`` is missing and a
toolchain is available.
"""

from __future__ import annotations

import ctypes
import logging
import subprocess
import threading
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

log = logging.getLogger(__name__)

NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
LIB_PATH = NATIVE_DIR / "librst_native.so"

_lib_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None


class ExrError(Exception):
    """Native EXR decode failure (bad magic, unsupported feature, IO, ...)."""


def _build_library() -> None:
    log.info("building native library in %s", NATIVE_DIR)
    subprocess.run(
        ["make", "-C", str(NATIVE_DIR)],
        check=True,
        capture_output=True,
        text=True,
    )


def get_lib() -> ctypes.CDLL:
    """Load (building if needed) the native library, with typed signatures."""
    global _lib
    with _lib_lock:
        if _lib is not None:
            return _lib
        if not LIB_PATH.exists():
            _build_library()
        lib = ctypes.CDLL(str(LIB_PATH))

        lib.exr_last_error.restype = ctypes.c_char_p
        lib.exr_read_info.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
            ctypes.c_char_p,
            ctypes.c_int,
        ]
        lib.exr_read_info.restype = ctypes.c_int
        lib.exr_read.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
        ]
        lib.exr_read.restype = ctypes.c_int

        lib.gbuffer_batch_last_error.restype = ctypes.c_char_p
        lib.gbuffer_batch_read.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.c_int),
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
        ]
        lib.gbuffer_batch_read.restype = ctypes.c_int

        lib.tensorbuffer_last_error.restype = ctypes.c_char_p
        lib.tensorbuffer_num_elements.argtypes = [ctypes.c_char_p]
        lib.tensorbuffer_num_elements.restype = ctypes.c_long
        lib.tensorbuffer_read.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_long,
        ]
        lib.tensorbuffer_read.restype = ctypes.c_int
        lib.tensorbuffer_write.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_long,
        ]
        lib.tensorbuffer_write.restype = ctypes.c_int

        _lib = lib
        return _lib


# ---------------------------------------------------------------------------
# EXR
# ---------------------------------------------------------------------------


def exr_info(path) -> Tuple[int, int, List[str]]:
    """(width, height, channel names in file order) of an EXR."""
    lib = get_lib()
    w = ctypes.c_int()
    h = ctypes.c_int()
    n = ctypes.c_int()
    names = ctypes.create_string_buffer(8192)
    rc = lib.exr_read_info(
        str(path).encode(), ctypes.byref(w), ctypes.byref(h),
        ctypes.byref(n), names, len(names),
    )
    if rc != 0:
        raise ExrError(f"{path}: {lib.exr_last_error().decode()}")
    name_list = names.value.decode().split("\n") if n.value else []
    return w.value, h.value, name_list


def read_exr(path) -> Dict[str, np.ndarray]:
    """Decode an EXR to ``{channel_name: (h, w) float32}``."""
    lib = get_lib()
    width, height, names = exr_info(path)
    out = np.empty((len(names), height, width), np.float32)
    rc = lib.exr_read(
        str(path).encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    )
    if rc != 0:
        raise ExrError(f"{path}: {lib.exr_last_error().decode()}")
    return {name: out[i] for i, name in enumerate(names)}


def read_gbuffer_planes(
    paths: Sequence,
    plane_counts: Sequence[int],
    height: int,
    width: int,
    num_threads: int = 4,
) -> np.ndarray:
    """Decode a screenshot's EXR set in parallel into (total_planes, h, w).

    ``plane_counts[i]`` planes are taken from ``paths[i]`` (R,G,B when >= 3,
    else R) — the stacking convention of ``load_unreal_hdr_screenshot``
    (reference ``hdrScreenshots.py:14-29``) executed by C++ worker threads.
    """
    lib = get_lib()
    if len(paths) != len(plane_counts):
        raise ValueError("paths and plane_counts must have equal length")
    total = int(sum(plane_counts))
    out = np.empty((total, height, width), np.float32)
    encoded = [str(p).encode() for p in paths]
    path_array = (ctypes.c_char_p * len(encoded))(*encoded)
    count_array = (ctypes.c_int * len(plane_counts))(*map(int, plane_counts))
    rc = lib.gbuffer_batch_read(
        path_array, count_array, len(encoded),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        int(height), int(width), int(num_threads),
    )
    if rc != 0:
        raise ExrError(lib.gbuffer_batch_last_error().decode())
    return out


# ---------------------------------------------------------------------------
# Engine tensor buffers (raw little-endian float32 stream)
# ---------------------------------------------------------------------------


def read_tensor_buffer(path, shape: Sequence[int]) -> np.ndarray:
    """Read a raw f32 engine buffer, validating the element count."""
    lib = get_lib()
    expected = int(np.prod(shape)) if len(shape) else 1
    n = lib.tensorbuffer_num_elements(str(path).encode())
    if n < 0:
        raise ValueError(
            f"{path}: {lib.tensorbuffer_last_error().decode()}"
        )
    if n != expected:
        raise ValueError(
            f"{path}: shape {tuple(shape)} wants {expected} float32 elements, "
            f"file has {n}"
        )
    out = np.empty(tuple(shape), np.float32)
    rc = lib.tensorbuffer_read(
        str(path).encode(),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        expected,
    )
    if rc != 0:
        raise ValueError(
            f"{path}: {lib.tensorbuffer_last_error().decode()}"
        )
    return out


def write_tensor_buffer(path, data: np.ndarray) -> Path:
    """Write float32 data as the engine's raw little-endian stream."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    lib = get_lib()
    arr = np.ascontiguousarray(data, np.float32)
    rc = lib.tensorbuffer_write(
        str(path).encode(),
        arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        arr.size,
    )
    if rc != 0:
        raise ValueError(
            f"{path}: {lib.tensorbuffer_last_error().decode()}"
        )
    return path
