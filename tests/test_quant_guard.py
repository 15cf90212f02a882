"""int8 scales provenance guard (fast, no Pallas kernels).

The fused kernel's int8 activation scales are per (checkpoint, style)
(``ops/pallas/fused_transfer.py`` ``calibrate_act_scales`` docstring).  These
tests cover the deploy-side guard rails: the fingerprinted scales file
format, fingerprint sensitivity, and the video CLI's refusal of a
mismatched ``--scales`` file without ``--force_scales``.  The kernel-level
saturation counter itself is exercised in ``test_fused_quant.py`` (slow
tier).  No reference counterpart: this guards framework-created surface.
"""

import types

import numpy as np
import pytest

from realtime_style_transfer_tpu.ops.pallas.fused_transfer import (
    ACT_C,
    load_act_scales,
    save_act_scales,
    scales_fingerprint,
)


def test_scales_file_roundtrip_with_fingerprint(tmp_path):
    scales = np.random.default_rng(0).random((17, ACT_C)).astype(np.float32)
    path = tmp_path / "scales.npz"
    save_act_scales(path, scales, "abc123")
    got, fp = load_act_scales(path)
    np.testing.assert_array_equal(got, scales)
    assert fp == "abc123"
    # honors the exact path even with a .npy suffix (np.savez would append)
    path2 = tmp_path / "scales.npy"
    save_act_scales(path2, scales, "xyz")
    assert path2.exists() and not (tmp_path / "scales.npy.npz").exists()
    got2, fp2 = load_act_scales(path2)
    np.testing.assert_array_equal(got2, scales)
    assert fp2 == "xyz"


def test_legacy_npy_scales_load_without_fingerprint(tmp_path):
    scales = np.ones((17, ACT_C), np.float32)
    path = tmp_path / "legacy.npy"
    np.save(path, scales)
    got, fp = load_act_scales(path)
    np.testing.assert_array_equal(got, scales)
    assert fp is None


def test_fingerprint_sensitive_to_weights_and_style():
    variables = {"params": {"conv": {"kernel": np.ones((3, 3, 4, 4),
                                                       np.float32)}}}
    sp = np.ones((1, 1, 8), np.float32)
    base = scales_fingerprint(variables, sp)
    assert base == scales_fingerprint(variables, sp)  # deterministic
    assert base != scales_fingerprint(variables, sp * 1.01)  # style-sensitive
    v2 = {"params": {"conv": {"kernel": np.full((3, 3, 4, 4), 2.0,
                                                np.float32)}}}
    assert base != scales_fingerprint(v2, sp)  # checkpoint-sensitive
    # dual weight map participates (scales depend on the blend)
    w = np.zeros((1, 4, 4, 1), np.float32)
    assert scales_fingerprint(variables, sp, w) != base


class _StubEngine:
    """Just enough engine surface for _get_scales' loaded-scales path."""

    def __init__(self, report):
        self._report = report

    def prepare_style(self, style_params, weights):  # pragma: no cover
        return "prepared"

    def pack_frame_np(self, frame):
        return frame

    def check_act_saturation(self, packed, prepared, scales):
        return self._report


def _args(tmp_path, **over):
    ns = types.SimpleNamespace(
        scales=None, scales_out=None, force_scales=False,
        calibration_frames=1)
    for k, v in over.items():
        setattr(ns, k, v)
    return ns


@pytest.fixture()
def cli_env(tmp_path):
    import predict_video_using_checkpoint as cli_mod

    variables = {"params": {"k": np.arange(4, dtype=np.float32)}}
    sp = np.ones((1, 1, 4), np.float32)
    fp = scales_fingerprint(variables, sp, None)
    scales = np.ones((2, ACT_C), np.float32)
    path = tmp_path / "scales.npz"
    return cli_mod, variables, sp, fp, scales, path


def test_cli_refuses_fingerprint_mismatch(cli_env, tmp_path):
    cli_mod, variables, sp, _fp, scales, path = cli_env
    save_act_scales(path, scales, "not-the-right-fingerprint")
    args = _args(tmp_path, scales=path)
    engine = _StubEngine([])
    with pytest.raises(SystemExit, match="DIFFERENT"):
        cli_mod._get_scales(args, engine, iter([]), sp, None, variables,
                            prepared="prepared")


def test_cli_force_scales_overrides_and_checks(cli_env, tmp_path, caplog):
    cli_mod, variables, sp, _fp, scales, path = cli_env
    save_act_scales(path, scales, "wrong")
    report = [{"stage": "stem", "max_ratio": 3.0, "clip_events": 1000,
               "n_quantized": 10000}]
    args = _args(tmp_path, scales=path, force_scales=True)
    engine = _StubEngine(report)
    frames = iter([np.zeros((2, 2, 3), np.float32)])
    with caplog.at_level("WARNING", logger="predict_video"):
        got, _ = cli_mod._get_scales(args, engine, frames, sp, None,
                                     variables, prepared="prepared")
    np.testing.assert_array_equal(got, scales)
    text = caplog.text
    assert "force_scales" in text and "SATURATE" in text


def test_cli_matching_fingerprint_loads_and_passes_check(cli_env, tmp_path,
                                                         caplog):
    cli_mod, variables, sp, fp, scales, path = cli_env
    save_act_scales(path, scales, fp)
    report = [{"stage": "stem", "max_ratio": 1.0, "clip_events": 0,
               "n_quantized": 10000}]
    args = _args(tmp_path, scales=path)
    engine = _StubEngine(report)
    frames = iter([np.zeros((2, 2, 3), np.float32)])
    with caplog.at_level("INFO", logger="predict_video"):
        got, _ = cli_mod._get_scales(args, engine, frames, sp, None,
                                     variables, prepared="prepared")
    np.testing.assert_array_equal(got, scales)
    assert "saturation check ok" in caplog.text
