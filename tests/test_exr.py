"""Native EXR decoder round-trip tests (writer in Python, reader in C++)."""

import numpy as np
import pytest

from realtime_style_transfer_tpu.data.exr import (
    PIXEL_TYPE_FLOAT,
    PIXEL_TYPE_HALF,
    write_exr,
)
from realtime_style_transfer_tpu.data.native import ExrError, read_exr


@pytest.mark.parametrize("compression", ["none", "rle", "zips", "zip"])
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


@pytest.mark.parametrize("compression", ["none", "zip"])
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
