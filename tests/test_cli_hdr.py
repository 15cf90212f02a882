"""HDR G-buffer CLI end-to-end: train + predict on fabricated EXR fixture sets."""

import numpy as np
import PIL.Image
import pytest

from realtime_style_transfer_tpu.config import ShapeConfig
from realtime_style_transfer_tpu.data.exr import write_gbuffer_fixture
from tests.test_cli import run_cli

pytestmark = pytest.mark.cli  # subprocess-heavy: excluded from the default run

HDR_SPEC = "rst-120-15-4-6"  # 60x120, 6 channels: FinalImage + BaseColor


@pytest.fixture(scope="module")
def hdr_fixture(tmp_path_factory):
    rng = np.random.default_rng(11)
    root = tmp_path_factory.mktemp("hdr")
    cfg = ShapeConfig.from_spec(HDR_SPEC)
    content = root / "content"
    style = root / "style"
    for sub in ("training", "validation"):
        (style / sub).mkdir(parents=True)
        for i in range(2):
            write_gbuffer_fixture(
                content / sub, f"shot{i}", cfg.channels, 70, 130, seed=i
            )
            arr = (rng.random((70, 130, 3)) * 255).astype(np.uint8)
            PIL.Image.fromarray(arr).save(style / sub / f"{i}.png")
    return root, cfg


def test_hdr_train_and_predict(hdr_fixture, tmp_path):
    root, cfg = hdr_fixture
    run = tmp_path / "run"
    run_cli(
        "train_network.py", "--network_spec", HDR_SPEC, "--loss", "dummy",
        "--no_depth_loss", "--epochs", "1", "--batch_size", "2",
        "--checkpoint_cadence", "1", "--dtype", "float32", "--log_dir", run,
        "--content_dir", root / "content", "--style_dir", root / "style",
    )
    assert (run / "weights").exists()

    out = tmp_path / "styled_hdr.png"
    run_cli(
        "predict_using_checkpoint.py", "--network_spec", HDR_SPEC,
        "--dtype", "float32", "-C", run,
        "-c", root / "content" / "validation" / "shot0.png",
        "-s", root / "style" / "validation" / "0.png", "-o", out,
    )
    img = np.asarray(PIL.Image.open(out))
    assert img.shape == (60, 120, 3)


def test_hdr_channel_count_guard(hdr_fixture, tmp_path):
    """Predicting with a 17-channel spec against a 6-channel fixture must fail
    loudly (missing EXR files), not silently mis-stack."""
    root, _ = hdr_fixture
    with pytest.raises(AssertionError, match="predict_using_checkpoint"):
        run_cli(
            "predict_using_checkpoint.py", "--network_spec", "rst-120-15-4-17",
            "--dtype", "float32", "-C", tmp_path,  # no checkpoint either
            "-c", root / "content" / "validation" / "shot0.png",
            "-s", root / "style" / "validation" / "0.png",
            "-o", tmp_path / "x.png",
        )
