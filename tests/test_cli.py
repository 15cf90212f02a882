"""CLI end-to-end tests: the scripts drive the whole framework as subprocesses.

This is the "minimum end-to-end slice" of SURVEY §7.5 exercised at the user-facing
surface: fabricate a tiny fixture dataset, train for one epoch, stylize an image
from the checkpoint, export deployable artifacts, and stylize again from them.
"""

import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import PIL.Image
import pytest

pytestmark = pytest.mark.cli  # subprocess-heavy: excluded from the default run

REPO = Path(__file__).resolve().parent.parent
SPEC = "rst-120-15-4-3"  # 60x120 frames, tiny bottleneck: fast CPU compiles


def run_cli(script, *args, timeout=1200):
    env = dict(os.environ)
    env["RST_PLATFORM"] = "cpu"
    env.setdefault(
        "JAX_COMPILATION_CACHE_DIR", str(REPO / ".jax_cache")
    )
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
    result = subprocess.run(
        [sys.executable, str(REPO / script), *map(str, args)],
        capture_output=True, text=True, timeout=timeout, cwd=REPO, env=env,
    )
    if result.returncode != 0:
        raise AssertionError(
            f"{script} failed ({result.returncode}):\n{result.stdout}\n{result.stderr}"
        )
    return result


@pytest.fixture(scope="module")
def fixture_data(tmp_path_factory):
    """Tiny SDR dataset: content + style images in training/validation splits."""
    rng = np.random.default_rng(0)
    root = tmp_path_factory.mktemp("dataset")
    content_dir = root / "content"
    style_dir = root / "style"
    for sub in ("training", "validation"):
        for d in (content_dir / sub, style_dir / sub):
            d.mkdir(parents=True)
        for i in range(3):
            for d in (content_dir / sub, style_dir / sub):
                arr = (rng.random((70, 130, 3)) * 255).astype(np.uint8)
                PIL.Image.fromarray(arr).save(d / f"{sub}_{i}.png")
    return root


@pytest.fixture(scope="module")
def trained_run(fixture_data, tmp_path_factory):
    """One-epoch training run via the train_network.py CLI."""
    log_dir = tmp_path_factory.mktemp("run")
    style_paths = sorted((fixture_data / "style").rglob("*.png"))
    # style images are consumed through the generic dataset path: point the
    # trainer at the content dir and reuse the debug-free wikiart-free route by
    # training with --content_dir and a style override via env is not exposed;
    # instead run the trainer module directly below.
    run_cli(
        "train_network.py",
        "--network_spec", SPEC, "--sdr", "--loss", "dummy", "--no_depth_loss",
        "--epochs", "1", "--batch_size", "2", "--checkpoint_cadence", "1",
        "--log_dir", log_dir, "--content_dir", fixture_data / "content",
        "--style_dir", fixture_data / "style",
        "--dtype", "float32",
    )
    return log_dir


def test_train_creates_artifacts(trained_run):
    assert (trained_run / "metrics.jsonl").exists()
    assert (trained_run / "config.json").exists()
    assert (trained_run / "weights").exists()
    metrics = [json.loads(l) for l in (trained_run / "metrics.jsonl").open()]
    tags = {m["tag"] for m in metrics}
    assert any(t.startswith("training/loss") for t in tags)
    assert any(t.startswith("validation/loss") for t in tags)
    images = list((trained_run / "images").glob("*.png"))
    assert images, "summary images missing"


def test_predict_using_checkpoint(trained_run, fixture_data, tmp_path):
    out = tmp_path / "styled.png"
    content = next((fixture_data / "content" / "validation").glob("*.png"))
    style = next((fixture_data / "style" / "validation").glob("*.png"))
    run_cli(
        "predict_using_checkpoint.py",
        "--network_spec", SPEC, "--sdr", "--dtype", "float32",
        "-C", trained_run, "-c", content, "-s", style, "-o", out, "-p",
    )
    img = np.asarray(PIL.Image.open(out))
    assert img.shape == (60, 120, 3)
    assert (tmp_path / "styled_content.png").exists()


def test_export_and_predict_saved(trained_run, fixture_data, tmp_path):
    export_dir = tmp_path / "export"
    run_cli(
        "save_using_checkpoint.py",
        "--network_spec", SPEC, "--sdr", "--dtype", "float32",
        "-C", trained_run, "-o", export_dir,
    )
    for artifact in ("inference.stablehlo", "predictor.stablehlo",
                     "transfer.stablehlo", "config.json", "checkpoint",
                     "transfer.onnx", "predictor.onnx"):
        assert (export_dir / artifact).exists(), artifact

    # the emitted ONNX executes (numpy runtime; semantics unit-tested elsewhere)
    from realtime_style_transfer_tpu.config import ShapeConfig
    from realtime_style_transfer_tpu.export.onnx_numpy import run_model
    from realtime_style_transfer_tpu.models.transfer import style_param_count

    cfg = ShapeConfig.from_spec(SPEC, hdr=False)
    n_params = style_param_count(
        cfg.content_shape, cfg.output_shape, cfg.bottleneck_res_y,
        cfg.bottleneck_num_filters,
    )
    stylized = run_model(
        (export_dir / "transfer.onnx").read_bytes(),
        {"content": np.full((1,) + cfg.content_shape, 0.5, np.float32),
         "style_params": np.zeros((1, n_params), np.float32)},
    )["stylized"]
    assert stylized.shape == (1,) + cfg.output_shape
    assert np.isfinite(stylized).all()

    out = tmp_path / "from_saved.png"
    content = next((fixture_data / "content" / "validation").glob("*.png"))
    style = next((fixture_data / "style" / "validation").glob("*.png"))
    run_cli(
        "predict_using_saved_models.py",
        "-m", export_dir, "-c", content, "-s", style, "-o", out,
    )
    assert np.asarray(PIL.Image.open(out)).shape == (60, 120, 3)


def test_predict_style_params_buffer(trained_run, fixture_data, tmp_path):
    from realtime_style_transfer_tpu.config import ShapeConfig
    from realtime_style_transfer_tpu.models.transfer import style_param_count

    out = tmp_path / "params.bin"
    style = next((fixture_data / "style" / "validation").glob("*.png"))
    run_cli(
        "predict_style_params.py",
        "--network_spec", SPEC, "--sdr", "--dtype", "float32",
        "-C", trained_run, "-s", style, "-o", out,
    )
    cfg = ShapeConfig.from_spec(SPEC, hdr=False)
    expected = style_param_count(
        cfg.content_shape, cfg.output_shape, cfg.bottleneck_res_y,
        cfg.bottleneck_num_filters,
    )
    buf = np.frombuffer(out.read_bytes(), "<f4")
    assert buf.size == expected


def test_permutation_feature_importance(trained_run, fixture_data, tmp_path):
    out = tmp_path / "importance"
    run_cli(
        "compute_permutation_feature_importance.py",
        "--network_spec", SPEC, "--sdr", "--dtype", "float32", "--loss", "dummy",
        "-C", trained_run,
        "--content_dir", fixture_data / "content" / "validation",
        "--style_dir", fixture_data / "style" / "validation",
        "--batch_size", "2", "--max_batches", "1", "-o", out,
    )
    csv = (out / "importance.csv").read_text()
    assert "FinalImage" in csv
    assert (out / "importance.tex").exists()
    assert (out / "progress.pkl").exists()  # incremental-resume cache

    # resume: second run completes instantly from the pickle cache
    run_cli(
        "compute_permutation_feature_importance.py",
        "--network_spec", SPEC, "--sdr", "--dtype", "float32", "--loss", "dummy",
        "-C", trained_run,
        "--content_dir", fixture_data / "content" / "validation",
        "--style_dir", fixture_data / "style" / "validation",
        "--batch_size", "2", "--max_batches", "1", "-o", out,
    )


def test_gradient_explanation(trained_run, fixture_data, tmp_path):
    out = tmp_path / "grads"
    run_cli(
        "compute_gradient_explanation.py",
        "--network_spec", SPEC, "--sdr", "--dtype", "float32", "--loss", "dummy",
        "-C", trained_run,
        "--content_dir", fixture_data / "content" / "validation",
        "--style_dir", fixture_data / "style" / "validation",
        "--batch_size", "2", "--max_batches", "1", "-o", out,
    )
    assert "FinalImage" in (out / "gradient_attribution.csv").read_text()


def test_feature_permutation_visualization(trained_run, fixture_data, tmp_path):
    out = tmp_path / "viz"
    style = next((fixture_data / "style" / "validation").glob("*.png"))
    run_cli(
        "generate_feature_permutation_visualization.py",
        "--network_spec", SPEC, "--sdr", "--dtype", "float32",
        "-C", trained_run,
        "--content_dir", fixture_data / "content" / "validation",
        "-s", style, "-o", out,
    )
    assert (out / "unperturbed.png").exists()
    assert (out / "swap_FinalImage.png").exists()


def test_show_tensor_buffer(tmp_path, rng):
    from realtime_style_transfer_tpu.data.native import write_tensor_buffer

    buf = tmp_path / "t.bin"
    write_tensor_buffer(buf, rng.random((8, 12, 3)).astype(np.float32))
    out = tmp_path / "t.png"
    run_cli("show_unreal_tensor_buffer.py", buf, "--shape", 8, 12, 3, "-o", out)
    assert out.exists()
