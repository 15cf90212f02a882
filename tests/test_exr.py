"""Native EXR decoder round-trip tests (writer in Python, reader in C++)."""

import numpy as np
import pytest

from realtime_style_transfer_tpu.data.exr import (
    PIXEL_TYPE_FLOAT,
    PIXEL_TYPE_HALF,
    write_exr,
)
from realtime_style_transfer_tpu.data.native import ExrError, read_exr


@pytest.mark.parametrize("compression", ["none", "rle", "zips", "zip", "piz"])
def test_roundtrip_float(tmp_path, rng, compression):
    h, w = 37, 61  # odd sizes: exercise ragged zip blocks
    chans = {
        "B": rng.standard_normal((h, w)).astype(np.float32),
        "G": rng.random((h, w)).astype(np.float32),
        "R": (rng.random((h, w)) * 100).astype(np.float32),
    }
    path = tmp_path / f"t_{compression}.exr"
    write_exr(path, chans, compression=compression, pixel_type=PIXEL_TYPE_FLOAT)
    got = read_exr(path)
    assert sorted(got) == ["B", "G", "R"]
    for name in chans:
        np.testing.assert_array_equal(got[name], chans[name])


@pytest.mark.parametrize("compression", ["none", "zip", "piz"])
def test_roundtrip_half(tmp_path, rng, compression):
    h, w = 16, 32
    data = {"R": rng.random((h, w)).astype(np.float32)}
    path = tmp_path / f"h_{compression}.exr"
    write_exr(path, data, compression=compression, pixel_type=PIXEL_TYPE_HALF)
    got = read_exr(path)
    np.testing.assert_allclose(
        got["R"], data["R"].astype(np.float16).astype(np.float32), rtol=0, atol=0
    )


def test_block_spanning_image(tmp_path, rng):
    # > 16 rows -> multiple ZIP blocks, last one ragged
    h, w = 40, 8
    data = {"R": rng.random((h, w)).astype(np.float32)}
    path = tmp_path / "blocks.exr"
    write_exr(path, data, compression="zip", pixel_type=PIXEL_TYPE_FLOAT)
    np.testing.assert_array_equal(read_exr(path)["R"], data["R"])


def test_bad_file_raises(tmp_path):
    path = tmp_path / "junk.exr"
    path.write_bytes(b"this is not an exr file at all")
    with pytest.raises(ExrError, match="magic"):
        read_exr(path)


def test_missing_file_raises(tmp_path):
    with pytest.raises(ExrError):
        read_exr(tmp_path / "nope.exr")


@pytest.mark.parametrize("pixel_type", [PIXEL_TYPE_FLOAT, PIXEL_TYPE_HALF])
def test_piz_block_spanning_and_degenerate(tmp_path, rng, pixel_type):
    """PIZ: > 32 rows -> multiple blocks (ragged last), plus 1-wide/1-tall
    degenerate wavelets; bit-exact round-trip through the native decoder."""
    for h, w in ((70, 37), (33, 1), (1, 65)):
        chans = {
            "B": (rng.standard_normal((h, w)) * 50).astype(np.float32),
            "G": np.zeros((h, w), np.float32),
            "R": (rng.random((h, w)) * 4).astype(np.float32),
        }
        path = tmp_path / f"piz_{h}x{w}_{pixel_type}.exr"
        write_exr(path, chans, compression="piz", pixel_type=pixel_type)
        got = read_exr(path)
        for name in chans:
            want = (chans[name] if pixel_type == PIXEL_TYPE_FLOAT
                    else chans[name].astype(np.float16).astype(np.float32))
            np.testing.assert_array_equal(got[name], want, err_msg=name)


def test_piz_w14_small_range(tmp_path, rng):
    """Few distinct small values -> maxValue < 2^14 -> the 14-bit wavelet."""
    data = {"R": (rng.integers(0, 8, (40, 40)) / 8.0).astype(np.float32)}
    path = tmp_path / "piz_small.exr"
    write_exr(path, data, compression="piz", pixel_type=PIXEL_TYPE_HALF)
    want = data["R"].astype(np.float16).astype(np.float32)
    np.testing.assert_array_equal(read_exr(path)["R"], want)


def test_piz_constant_image(tmp_path):
    """All-equal pixels: single-symbol Huffman table + empty bitmap edge."""
    data = {"R": np.full((40, 24), 0.0, np.float32),
            "G": np.full((40, 24), 2.5, np.float32)}
    path = tmp_path / "piz_const.exr"
    write_exr(path, data, compression="piz", pixel_type=PIXEL_TYPE_FLOAT)
    got = read_exr(path)
    np.testing.assert_array_equal(got["R"], data["R"])
    np.testing.assert_array_equal(got["G"], data["G"])


def test_unsupported_compression_names_the_fix(tmp_path):
    """A PXR24 file fails with a clear re-encode instruction, not garbage."""
    path = tmp_path / "pxr24.exr"
    write_exr(path, {"R": np.zeros((4, 4), np.float32)}, compression="none")
    blob = bytearray(path.read_bytes())
    key = b"compression\x00compression\x00"
    i = blob.find(key)
    blob[i + len(key) + 4] = 5  # PXR24
    path.write_bytes(bytes(blob))
    with pytest.raises(ExrError, match="re-encode"):
        read_exr(path)
