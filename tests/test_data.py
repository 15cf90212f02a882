"""Data-layer tests: imaging ops, pipeline, HDR G-buffer loading, tensor buffers.

The HDR tests fabricate Unreal-style fixture sets (PNG + per-channel EXRs) with the
pure-Python writer and read them back through the native C++ decoder — the
committed-fixture strategy SURVEY §4 calls for.
"""

import numpy as np
import PIL.Image
import pytest

from realtime_style_transfer_tpu.config import ShapeConfig
from realtime_style_transfer_tpu.data import imaging, pipeline
from realtime_style_transfer_tpu.data.exr import write_gbuffer_fixture
from realtime_style_transfer_tpu.data.hdr_screenshots import (
    find_screenshots,
    iter_hdr_screenshots,
    load_unreal_hdr_screenshot,
)
from realtime_style_transfer_tpu.data.native import (
    read_tensor_buffer,
    write_tensor_buffer,
)

CHANNELS_6 = (("FinalImage", 3), ("BaseColor", 3))


# ---- imaging -------------------------------------------------------------------


def test_resize_bilinear_identity(rng):
    img = rng.random((8, 12, 3)).astype(np.float32)
    np.testing.assert_array_equal(imaging.resize_bilinear(img, (8, 12)), img)


def test_resize_bilinear_downsample_constant():
    img = np.full((16, 16, 2), 7.0, np.float32)
    out = imaging.resize_bilinear(img, (4, 8))
    assert out.shape == (4, 8, 2)
    np.testing.assert_allclose(out, 7.0, rtol=1e-6)


def test_center_crop_and_pad():
    img = np.arange(6 * 8 * 1, dtype=np.float32).reshape(6, 8, 1)
    cropped = imaging.center_crop_or_pad(img, (4, 4))
    np.testing.assert_array_equal(cropped, img[1:5, 2:6])
    padded = imaging.center_crop_or_pad(img, (8, 10))
    assert padded.shape == (8, 10, 1)
    np.testing.assert_array_equal(padded[1:7, 1:9], img)


def test_cover_resize_shape_covers_target():
    for in_hw in [(100, 200), (200, 100), (480, 960), (33, 77)]:
        for target in [(60, 120), (120, 60), (64, 64)]:
            rh, rw = imaging.cover_resize_shape(in_hw, target)
            assert rh >= target[0] and rw >= target[1]
            # aspect preserved (within the ceil rounding)
            assert abs(rh / rw - in_hw[0] / in_hw[1]) < 0.05


def test_preprocess_numpy_image_shape(rng):
    img = rng.random((100, 300, 17)).astype(np.float32)
    out = imaging.preprocess_numpy_image(img, (60, 120, 17))
    assert out.shape == (60, 120, 17)


def test_load_image_roundtrip(tmp_path, rng):
    arr = (rng.random((50, 80, 3)) * 255).astype(np.uint8)
    p = tmp_path / "img.png"
    PIL.Image.fromarray(arr).save(p)
    out = imaging.load_image(p, (40, 40, 3))
    assert out.shape == (40, 40, 3)
    assert out.dtype == np.float32
    assert 0.0 <= out.min() and out.max() <= 1.0


# ---- pipeline --------------------------------------------------------------------


def test_indexed_dataset_cache_and_skip(tmp_path):
    calls = []

    def loader(item):
        calls.append(item)
        if item == "bad":
            raise IOError("corrupt")
        return np.full((2, 2), float(len(item)), np.float32)

    ds = pipeline.IndexedDataset(["aa", "bad", "cccc"], loader,
                                 cache_dir=tmp_path / "cache")
    out = list(ds)  # 'bad' must be skipped, not fatal
    assert len(out) == 2
    np.testing.assert_array_equal(out[0], np.full((2, 2), 2.0))
    # second pass: served from cache, loader not called for good items
    calls.clear()
    out2 = list(ds)
    assert len(out2) == 2
    assert calls == ["bad"]  # only the failing item is retried


def test_split_train_validation_deterministic():
    items = list(range(100))
    t1, v1 = pipeline.split_train_validation(items, seed=7)
    t2, v2 = pipeline.split_train_validation(items, seed=7)
    assert t1 == t2 and v1 == v2
    assert len(v1) == 20 and len(t1) == 80
    assert sorted(t1 + v1) == items


def test_pair_and_batch(rng):
    content = [(rng.random((4, 6, 3)).astype(np.float32),
                rng.random((4, 6, 3)).astype(np.float32)) for _ in range(5)]
    style = [rng.random((4, 6, 3)).astype(np.float32) for _ in range(5)]
    paired = pipeline.pair_content_and_style(content, style)
    batches = list(pipeline.batched(paired, 2))
    assert len(batches) == 2  # drop remainder
    inputs, gt = batches[0]
    assert inputs["content"].shape == (2, 4, 6, 3)
    assert inputs["style"].shape == (2, 1, 4, 6, 3)
    assert gt["content"].shape == (2, 4, 6, 3)
    assert "style_weights" not in inputs


def test_pair_includes_zero_style_weights(rng):
    content = [(np.zeros((4, 6, 3), np.float32), np.zeros((4, 6, 3), np.float32))]
    style = [np.zeros((4, 6, 3), np.float32)]
    paired = list(pipeline.pair_content_and_style(
        content, style, style_weights_shape=(4, 6, 1)))
    inputs, _ = paired[0]
    np.testing.assert_array_equal(inputs["style_weights"], np.zeros((4, 6, 1)))


def test_device_prefetcher_orders_and_ends():
    batches = [np.full((2,), i, np.float32) for i in range(5)]
    got = list(pipeline.DevicePrefetcher(iter(batches), depth=2))
    assert len(got) == 5
    for i, g in enumerate(got):
        np.testing.assert_array_equal(np.asarray(g), batches[i])


def test_device_prefetcher_propagates_errors():
    def gen():
        yield np.zeros(2)
        raise RuntimeError("boom")

    pf = pipeline.DevicePrefetcher(gen(), depth=1)
    next(pf)
    with pytest.raises(RuntimeError, match="boom"):
        next(pf)


# ---- HDR G-buffer loading --------------------------------------------------------


def test_load_unreal_hdr_screenshot(tmp_path):
    write_gbuffer_fixture(tmp_path, "shot0", CHANNELS_6, 24, 48, seed=3)
    stacked = load_unreal_hdr_screenshot(tmp_path / "shot0.png", CHANNELS_6)
    assert stacked.shape == (24, 48, 6)
    assert stacked.dtype == np.float32


def test_iter_hdr_screenshots_with_ground_truth(tmp_path):
    for i in range(2):
        write_gbuffer_fixture(tmp_path, f"s{i}", CHANNELS_6, 24, 48, seed=i)
    # one corrupt set: PNG without its EXRs -> must be skipped
    PIL.Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(tmp_path / "broken.png")
    pngs = find_screenshots(tmp_path)
    assert len(pngs) == 3
    out = list(iter_hdr_screenshots(
        pngs, CHANNELS_6, (16, 32, 6), output_shape=(16, 32, 3)))
    assert len(out) == 2
    content, gt = out[0]
    assert content.shape == (16, 32, 6)
    assert gt.shape == (16, 32, 3)


def test_native_batch_loader_matches_per_file_path(tmp_path):
    """gbuffer_batch_read (threaded C++) == the per-file read_exr stacking."""
    from realtime_style_transfer_tpu.data.native import read_exr, read_gbuffer_planes

    write_gbuffer_fixture(tmp_path, "s", CHANNELS_6, 20, 30, seed=5)
    paths = [tmp_path / f"s_{name}.exr" for name, _ in CHANNELS_6]
    counts = [n for _, n in CHANNELS_6]
    batch = read_gbuffer_planes(paths, counts, 20, 30, num_threads=3)
    assert batch.shape == (6, 20, 30)

    per_file = []
    for path, n in zip(paths, counts):
        exr = read_exr(path)
        per_file.extend([exr["R"], exr["G"], exr["B"]] if n == 3 else [exr["R"]])
    np.testing.assert_array_equal(batch, np.stack(per_file))


def test_native_batch_loader_dim_mismatch_raises(tmp_path):
    from realtime_style_transfer_tpu.data.exr import write_exr
    from realtime_style_transfer_tpu.data.native import ExrError, read_gbuffer_planes

    write_exr(tmp_path / "a.exr", {"R": np.zeros((8, 8), np.float32)})
    with pytest.raises(ExrError, match="expected"):
        read_gbuffer_planes([tmp_path / "a.exr"], [1], 16, 16)


# ---- tensor buffers ---------------------------------------------------------------


def test_tensorbuffer_roundtrip(tmp_path, rng):
    data = rng.standard_normal((3, 5, 2)).astype(np.float32)
    p = tmp_path / "buf.bin"
    write_tensor_buffer(p, data)
    got = read_tensor_buffer(p, (3, 5, 2))
    np.testing.assert_array_equal(got, data)
    # plugin format parity: plain little-endian float32 stream
    np.testing.assert_array_equal(
        np.frombuffer(p.read_bytes(), "<f4").reshape(3, 5, 2), data
    )


def test_tensorbuffer_shape_mismatch(tmp_path):
    p = tmp_path / "buf.bin"
    write_tensor_buffer(p, np.zeros(10, np.float32))
    with pytest.raises(ValueError, match="wants"):
        read_tensor_buffer(p, (3, 5))


def test_device_prefetcher_stopiteration_is_sticky():
    """Exhausted (or errored) prefetchers keep raising StopIteration instead
    of blocking forever on the finished worker's queue."""
    pf = pipeline.DevicePrefetcher(iter([1, 2]), device_put=lambda x: x)
    assert list(pf) == [1, 2]
    for _ in range(3):
        try:
            next(pf)
        except StopIteration:
            continue
        raise AssertionError("expected StopIteration")
