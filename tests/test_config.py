"""ShapeConfig parity tests (reference shape_config.py semantics)."""

import pytest

from realtime_style_transfer_tpu.config import ShapeConfig, channels_from_count


def test_channel_derivation_counts():
    # reference shape_config.py:54-73
    assert [c for c, _ in channels_from_count(3)] == ["FinalImage"]
    assert [c for c, _ in channels_from_count(6)] == ["FinalImage", "BaseColor"]
    ch17 = channels_from_count(17)
    assert sum(n for _, n in ch17) == 17
    assert ("ShadowMask", 1) not in ch17
    ch18 = channels_from_count(18)
    assert sum(n for _, n in ch18) == 18
    assert ("ShadowMask", 1) in ch18


def test_default_shapes():
    cfg = ShapeConfig()
    assert cfg.input_dimensions == (480, 960)
    assert cfg.output_shape == (480, 960, 3)
    assert cfg.content_shape == (480, 960, 18)
    assert cfg.style_shape == (1, 480, 960, 3)
    assert cfg.style_weights_shape is None
    assert "style_weights" not in cfg.input_shape


def test_sdr_shapes():
    cfg = ShapeConfig(hdr=False, num_channels=3)
    assert cfg.content_shape == (480, 960, 3)


def test_multi_style_weights_shape():
    cfg = ShapeConfig(num_styles=2)
    assert cfg.style_weights_shape == (480, 960, 1)
    assert cfg.input_shape["style_weights"] == (480, 960, 1)
    assert cfg.style_shape == (2, 480, 960, 3)


def test_spec_roundtrip():
    cfg = ShapeConfig.from_spec("rst-960-120-128-17")
    assert cfg.input_dimensions == (480, 960)
    assert cfg.bottleneck_res_y == 120
    assert cfg.bottleneck_num_filters == 128
    assert cfg.num_channels == 17
    assert cfg.total_channels == 17
    assert cfg.to_spec() == "rst-960-120-128-17"

    with pytest.raises(ValueError):
        ShapeConfig.from_spec("bogus-1-2-3")


def test_dummy_element_shapes():
    cfg = ShapeConfig(num_styles=2, resolution_divider=8, num_channels=3, hdr=False)
    element, gt = cfg.get_dummy_input_element()
    assert element["content"].shape == (1, 120, 240, 3)
    assert element["style"].shape == (1, 2, 120, 240, 3)
    assert element["style_weights"].shape == (1, 120, 240, 1)
    assert gt["content"].shape == (1, 120, 240, 3)
    assert gt["style"].shape == (1, 2, 120, 240, 3)


def test_config_is_hashable_static_arg():
    a = ShapeConfig()
    b = ShapeConfig()
    assert hash(a) == hash(b) and a == b
