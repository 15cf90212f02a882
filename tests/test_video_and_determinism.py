"""Video streaming CLI test (PNG sink) + seed-determinism tests.

Determinism tests fill a gap the reference left open (SURVEY §4: "no seed
determinism tests").
"""

import numpy as np
import PIL.Image
import pytest

from tests.test_cli import SPEC, run_cli


@pytest.fixture(scope="module")
def frames_and_run(tmp_path_factory):
    rng = np.random.default_rng(3)
    root = tmp_path_factory.mktemp("video")
    content = root / "content"
    style = root / "style"
    for sub in ("training", "validation"):
        (content / sub).mkdir(parents=True)
        (style / sub).mkdir(parents=True)
        for i in range(2):
            for d in (content / sub, style / sub):
                arr = (rng.random((70, 130, 3)) * 255).astype(np.uint8)
                PIL.Image.fromarray(arr).save(d / f"{i}.png")
    run = root / "run"
    run_cli(
        "train_network.py", "--network_spec", SPEC, "--sdr", "--loss", "dummy",
        "--no_depth_loss", "--epochs", "1", "--batch_size", "2",
        "--checkpoint_cadence", "1", "--log_dir", run,
        "--content_dir", content, "--style_dir", style, "--dtype", "float32",
    )
    return root, run


@pytest.mark.cli
def test_predict_video_png_sink(frames_and_run, tmp_path):
    root, run = frames_and_run
    out = tmp_path / "video.mp4"
    run_cli(
        "predict_video_using_checkpoint.py",
        "--network_spec", SPEC, "--sdr", "--dtype", "float32",
        "-C", run, "-s", root / "style" / "validation" / "0.png",
        "--frames_dir", root / "content" / "validation",
        "-o", out, "--max_frames", "2",
    )
    # no ffmpeg in this image -> PNG sequence sink
    frames = sorted((tmp_path / "video").glob("frame_*.png"))
    assert len(frames) == 2
    img = np.asarray(PIL.Image.open(frames[0]))
    assert img.shape == (60, 120, 3)


@pytest.mark.cli
def test_prediction_is_deterministic(frames_and_run, tmp_path):
    root, run = frames_and_run
    content = root / "content" / "validation" / "0.png"
    style = root / "style" / "validation" / "0.png"
    outs = []
    for i in range(2):
        out = tmp_path / f"o{i}.png"
        run_cli(
            "predict_using_checkpoint.py", "--network_spec", SPEC, "--sdr",
            "--dtype", "float32", "-C", run, "-c", content, "-s", style, "-o", out,
        )
        outs.append(np.asarray(PIL.Image.open(out)))
    np.testing.assert_array_equal(outs[0], outs[1])


@pytest.mark.cli
def test_different_styles_give_different_outputs(frames_and_run, tmp_path):
    root, run = frames_and_run
    content = root / "content" / "validation" / "0.png"
    outs = []
    for i in range(2):
        out = tmp_path / f"s{i}.png"
        run_cli(
            "predict_using_checkpoint.py", "--network_spec", SPEC, "--sdr",
            "--dtype", "float32", "-C", run, "-c", content,
            "-s", root / "style" / "validation" / f"{i}.png", "-o", out,
        )
        outs.append(np.asarray(PIL.Image.open(out)).astype(np.int32))
    assert np.abs(outs[0] - outs[1]).max() > 0


def test_training_init_is_seed_deterministic():
    import jax

    from realtime_style_transfer_tpu.config import ShapeConfig
    from realtime_style_transfer_tpu.models.training import (
        make_style_transfer_training_model,
    )

    cfg = ShapeConfig(
        resolution_divider=16, bottleneck_res_y=15, bottleneck_num_filters=4,
        num_channels=3, hdr=False, feature_extractor="dummy",
        with_depth_loss=False,
    )
    tm = make_style_transfer_training_model(cfg, loss_extractor="dummy")
    s1 = tm.init_state(jax.random.PRNGKey(5))
    s2 = tm.init_state(jax.random.PRNGKey(5))
    s3 = tm.init_state(jax.random.PRNGKey(6))
    flat1 = jax.tree.leaves(s1.params)
    flat2 = jax.tree.leaves(s2.params)
    flat3 = jax.tree.leaves(s3.params)
    assert all(np.array_equal(a, b) for a, b in zip(flat1, flat2))
    assert any(not np.array_equal(a, b) for a, b in zip(flat1, flat3))


@pytest.mark.cli
def test_predict_video_dual_style(frames_and_run, tmp_path):
    """Dual-style streaming: repeated -s plus a -w weight map (framework
    extension of the reference's single-style video loop; the fused TPU path
    has the same signature, CPU falls back to packed)."""
    root, run = frames_and_run
    wm = tmp_path / "weights.png"
    grad = np.tile(np.linspace(0, 255, 120, dtype=np.uint8), (60, 1))
    PIL.Image.fromarray(grad, mode="L").save(wm)
    out = tmp_path / "dual.mp4"
    run_cli(
        "predict_video_using_checkpoint.py",
        "--network_spec", SPEC, "--sdr", "--dtype", "float32",
        "-C", run,
        "-s", root / "style" / "validation" / "0.png",
        "-s", root / "style" / "validation" / "1.png",
        "-w", wm,
        "--frames_dir", root / "content" / "validation",
        "-o", out, "--max_frames", "1",
    )
    frames = sorted((tmp_path / "dual").glob("frame_*.png"))
    assert len(frames) == 1
    assert np.asarray(PIL.Image.open(frames[0])).shape == (60, 120, 3)


FUSED_SPEC = "rst-128-16-8-3"  # fused-family: wp=32 (%8==0), 2c/2e, <=128f


@pytest.fixture(scope="module")
def fused_family_run(tmp_path_factory):
    """Tiny trained run on a fused-envelope spec (SPEC's wp=30 is outside)."""
    rng = np.random.default_rng(11)
    root = tmp_path_factory.mktemp("fused_video")
    content = root / "content"
    style = root / "style"
    for sub in ("training", "validation"):
        (content / sub).mkdir(parents=True)
        (style / sub).mkdir(parents=True)
        for i in range(2):
            for d in (content / sub, style / sub):
                arr = (rng.random((70, 140, 3)) * 255).astype(np.uint8)
                PIL.Image.fromarray(arr).save(d / f"{i}.png")
    run = root / "run"
    run_cli(
        "train_network.py", "--network_spec", FUSED_SPEC, "--sdr",
        "--loss", "dummy", "--no_depth_loss", "--epochs", "1",
        "--batch_size", "2", "--checkpoint_cadence", "1", "--log_dir", run,
        "--content_dir", content, "--style_dir", style, "--dtype", "float32",
    )
    return root, run


@pytest.mark.cli
def test_predict_video_int8_quant(fused_family_run, tmp_path):
    """--quant int8: calibrate-on-first-frames deploy flow through the CLI.

    Runs the same two frames through the bf16 fused path and the int8 one
    (both interpret-mode on CPU); the quantized stream must stay within a
    few u8 levels of bf16 (interpret fidelity of quant='int8' is ~0.02 in
    [0,1] units — ROADMAP r3 finding 10)."""
    root, run = fused_family_run
    style = root / "style" / "validation" / "0.png"
    common = [
        "predict_video_using_checkpoint.py",
        "--network_spec", FUSED_SPEC, "--sdr", "--dtype", "float32",
        "-C", run, "-s", style,
        "--frames_dir", root / "content" / "validation",
        "--max_frames", "2", "--path", "fused",
    ]
    run_cli(*common, "-o", tmp_path / "bf16.mp4")
    run_cli(*common, "-o", tmp_path / "int8.mp4",
            "--quant", "int8", "--calibration_frames", "1",
            "--scales_out", tmp_path / "scales.npy")
    bf16 = sorted((tmp_path / "bf16").glob("frame_*.png"))
    int8 = sorted((tmp_path / "int8").glob("frame_*.png"))
    assert len(bf16) == 2 and len(int8) == 2
    for a, b in zip(bf16, int8):
        fa = np.asarray(PIL.Image.open(a)).astype(np.int16)
        fb = np.asarray(PIL.Image.open(b)).astype(np.int16)
        assert fa.shape == (64, 128, 3)
        assert np.abs(fa - fb).max() <= 12  # quantization, not divergence

    # saved-scales restart: --scales skips calibration (fingerprint matches,
    # saturation check runs and passes), output is identical
    assert (tmp_path / "scales.npy").exists()
    run_cli(*common, "-o", tmp_path / "reuse.mp4",
            "--quant", "int8", "--scales", tmp_path / "scales.npy")
    reuse = sorted((tmp_path / "reuse").glob("frame_*.png"))
    for a, b in zip(int8, reuse):
        np.testing.assert_array_equal(
            np.asarray(PIL.Image.open(a)), np.asarray(PIL.Image.open(b)))

    # wrong-style deploy of the same scales file: the provenance fingerprint
    # differs, so the CLI must REFUSE without --force_scales (the int8
    # scale/style deploy contract, fused_transfer.calibrate_act_scales)
    other_style = root / "style" / "validation" / "1.png"
    mismatched = [
        "predict_video_using_checkpoint.py",
        "--network_spec", FUSED_SPEC, "--sdr", "--dtype", "float32",
        "-C", run, "-s", other_style,
        "--frames_dir", root / "content" / "validation",
        "--max_frames", "1", "--path", "fused",
        "--quant", "int8", "--scales", tmp_path / "scales.npy",
    ]
    with pytest.raises(AssertionError, match="DIFFERENT"):
        run_cli(*mismatched, "-o", tmp_path / "refused.mp4")


@pytest.mark.cli
def test_predict_video_int8_quant_data_parallel(fused_family_run, tmp_path):
    """--quant int8 --data_parallel 2: calibrate single-chip, rebuild the
    quant streamer, replay calibration frames through the grouped stream.
    Same scales (1 calibration frame) as the single-chip int8 run, so the
    sharded output must match it to u8 rounding."""
    root, run = fused_family_run
    style = root / "style" / "validation" / "0.png"
    common = [
        "predict_video_using_checkpoint.py",
        "--network_spec", FUSED_SPEC, "--sdr", "--dtype", "float32",
        "-C", run, "-s", style,
        "--frames_dir", root / "content" / "validation",
        "--max_frames", "2", "--path", "fused",
        "--quant", "int8", "--calibration_frames", "1",
    ]
    run_cli(*common, "-o", tmp_path / "single.mp4")
    run_cli(*common, "-o", tmp_path / "dp.mp4", "--data_parallel", "2")
    single = sorted((tmp_path / "single").glob("frame_*.png"))
    dp = sorted((tmp_path / "dp").glob("frame_*.png"))
    assert len(single) == 2 and len(dp) == 2
    for a, b in zip(single, dp):
        fa = np.asarray(PIL.Image.open(a)).astype(np.int16)
        fb = np.asarray(PIL.Image.open(b)).astype(np.int16)
        assert np.abs(fa - fb).max() <= 1  # u8 rounding only


@pytest.mark.cli
def test_predict_video_quant_requires_fused(frames_and_run, tmp_path):
    """SPEC's wp=30 is outside the fused envelope: --quant int8 must refuse
    (auto falls back to packed on CPU), not silently run unquantized."""
    root, run = frames_and_run
    with pytest.raises(AssertionError, match="requires the fused path"):
        run_cli(
            "predict_video_using_checkpoint.py",
            "--network_spec", SPEC, "--sdr", "--dtype", "float32",
            "-C", run, "-s", root / "style" / "validation" / "0.png",
            "--frames_dir", root / "content" / "validation",
            "-o", tmp_path / "v.mp4", "--max_frames", "1", "--quant", "int8",
        )


@pytest.mark.cli
def test_predict_video_data_parallel(frames_and_run, tmp_path):
    """--data_parallel 2: frames sharded over a 2-chip data mesh via
    shard_map (packed per-chip program for this non-fused-family spec);
    3 frames -> 2 steps with a padded tail that must be dropped on write."""
    root, run = frames_and_run
    out = tmp_path / "video.mp4"
    # private copy of the content dir + a 3rd frame so the last group is
    # padded — do NOT mutate the module-scoped fixture directory
    import shutil

    frames_dir = tmp_path / "content"
    shutil.copytree(root / "content" / "validation", frames_dir)
    arr = (np.random.default_rng(9).random((70, 130, 3)) * 255)
    PIL.Image.fromarray(arr.astype(np.uint8)).save(frames_dir / "2.png")
    run_cli(
        "predict_video_using_checkpoint.py",
        "--network_spec", SPEC, "--sdr", "--dtype", "float32",
        "-C", run, "-s", root / "style" / "validation" / "0.png",
        "--frames_dir", frames_dir,
        "-o", out, "--max_frames", "3", "--data_parallel", "2",
    )
    frames = sorted((tmp_path / "video").glob("frame_*.png"))
    assert len(frames) == 3
    img = np.asarray(PIL.Image.open(frames[0]))
    assert img.shape == (60, 120, 3)

    # single-chip run on the same inputs: sharding must not change pixels
    out2 = tmp_path / "video_single.mp4"
    run_cli(
        "predict_video_using_checkpoint.py",
        "--network_spec", SPEC, "--sdr", "--dtype", "float32",
        "-C", run, "-s", root / "style" / "validation" / "0.png",
        "--frames_dir", frames_dir,
        "-o", out2, "--max_frames", "3", "--path", "packed",
    )
    single = sorted((tmp_path / "video_single").glob("frame_*.png"))
    for a, b in zip(frames, single):
        fa = np.asarray(PIL.Image.open(a)).astype(np.int16)
        fb = np.asarray(PIL.Image.open(b)).astype(np.int16)
        assert np.abs(fa - fb).max() <= 1  # u8 rounding only
