"""Engine-interop round trip (CLI), debug-dataset path, and aux-module tests."""

import json

import numpy as np
import PIL.Image
import pytest

from realtime_style_transfer_tpu.tracing.profiler import FrameTimer
from realtime_style_transfer_tpu.tracing.logsetup import RateLimitedStream
from realtime_style_transfer_tpu.utils import comparison_table, describe
from tests.test_cli import SPEC, run_cli


@pytest.mark.cli
def test_style_params_roundtrip_through_compare_cli(tmp_path, rng):
    """predict_style_params buffer -> compare_unreal_style_params parity table."""
    # fabricate a tiny run
    root = tmp_path
    for d in ("content", "style"):
        for sub in ("training", "validation"):
            p = root / d / sub
            p.mkdir(parents=True)
            for i in range(2):
                arr = (rng.random((70, 130, 3)) * 255).astype(np.uint8)
                PIL.Image.fromarray(arr).save(p / f"{i}.png")
    run = root / "run"
    run_cli(
        "train_network.py", "--network_spec", SPEC, "--sdr", "--loss", "dummy",
        "--no_depth_loss", "--epochs", "1", "--batch_size", "2",
        "--checkpoint_cadence", "1", "--dtype", "float32", "--log_dir", run,
        "--content_dir", root / "content", "--style_dir", root / "style",
    )
    style = root / "style" / "validation" / "0.png"
    buf = root / "params.bin"
    run_cli(
        "predict_style_params.py", "--network_spec", SPEC, "--sdr",
        "--dtype", "float32", "-C", run, "-s", style, "-o", buf,
    )
    # the engine-side buffer compared against the python predictor: identical
    result = run_cli(
        "compare_unreal_style_params.py", "--network_spec", SPEC, "--sdr",
        "--dtype", "float32", "-C", run, "-s", style, "-b", buf,
    )
    assert "unreal" in result.stdout and "python" in result.stdout
    # diff row must be ~zero (same model, same input)
    for line in result.stdout.splitlines():
        if line.startswith("|unreal - python|"):
            assert float(line.split()[-2]) < 1e-4  # max column
            break
    else:
        pytest.fail("diff row missing from comparison table")


def test_debug_dataset_assembly(tmp_path, monkeypatch, rng):
    """get_dataset_debug builds the 100-image subset layout from a corpus dir."""
    from realtime_style_transfer_tpu.config import ShapeConfig
    from realtime_style_transfer_tpu.data import wikiart

    style_dir = tmp_path / "wikiart"
    image_dir = style_dir / "images"
    image_dir.mkdir(parents=True)
    for i in range(10):
        arr = (rng.random((40, 60, 3)) * 255).astype(np.uint8)
        PIL.Image.fromarray(arr).save(image_dir / f"{i:02d}.jpg")
    content_dir = tmp_path / "content"
    for sub in ("training", "validation"):
        (content_dir / sub).mkdir(parents=True)
        for i in range(2):
            arr = (rng.random((40, 60, 3)) * 255).astype(np.uint8)
            PIL.Image.fromarray(arr).save(content_dir / sub / f"{i}.png")

    monkeypatch.setattr(wikiart, "STYLE_IMAGE_DIR", image_dir)
    monkeypatch.setattr(wikiart, "STYLE_DEBUG_IMAGE_DIR", style_dir / "debug")
    monkeypatch.setattr(wikiart, "CONTENT_DEBUG_IMAGE_DIR", content_dir)

    cfg = ShapeConfig(resolution_divider=16, bottleneck_res_y=15,
                      bottleneck_num_filters=4, num_channels=3, hdr=False)
    make_train, make_val, n_train, n_val = wikiart.get_dataset_debug(
        cfg, batch_size=2, hdr=False
    )
    assert (style_dir / "debug" / "training").exists()
    inputs, gt = next(iter(make_train()))
    assert inputs["content"].shape == (2, 60, 120, 3)


def test_frame_timer_percentiles():
    t = FrameTimer()
    for _ in range(10):
        with t.frame():
            pass
    stats = t.percentiles()
    assert stats["frames"] == 10
    assert 0 <= stats["p50_ms"] <= stats["p99_ms"]


def test_rate_limited_stream_suppresses_duplicates():
    class Sink:
        def __init__(self):
            self.lines = []

        def write(self, msg):
            self.lines.append(msg)

        def flush(self):
            pass

    sink = Sink()
    s = RateLimitedStream(sink, min_interval_s=60)
    for _ in range(5):
        s.write("same\n")
    s.write("different\n")
    assert sink.lines.count("same\n") == 1
    assert any("suppressed" in l for l in sink.lines)
    assert "different\n" in sink.lines


def test_describe_and_table(rng):
    a = rng.random(100)
    d = describe(a)
    assert set(d) == {"mean", "var", "min", "max", "count"}
    table = comparison_table({"a": a})
    assert "mean" in table and "a" in table


def test_renderers_predict_datapoint(tmp_path):
    import jax

    from realtime_style_transfer_tpu import renderers
    from realtime_style_transfer_tpu.config import ShapeConfig
    from realtime_style_transfer_tpu.models.training import (
        make_style_transfer_training_model,
    )

    cfg = ShapeConfig(resolution_divider=16, bottleneck_res_y=15,
                      bottleneck_num_filters=4, num_channels=3, hdr=False,
                      feature_extractor="dummy", with_depth_loss=False)
    tm = make_style_transfer_training_model(cfg, loss_extractor="dummy")
    state = tm.init_state(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    inputs = {name: rng.random((1,) + shape, dtype=np.float32)
              for name, shape in cfg.input_shape.items()}
    gt = {"content": inputs["content"][..., :3], "style": inputs["style"]}
    out = tmp_path / "figure.png"
    renderers.predict_datapoint(tm, state, (inputs, gt), (inputs, gt),
                                save_path=out)
    assert out.exists() and out.stat().st_size > 0

    img = renderers.tensor_to_image(np.zeros((4, 6, 3), np.float32))
    assert img.size == (6, 4)
