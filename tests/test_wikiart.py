"""WikiArt corpus-manager tests on a synthetic manifest (offline).

The reference's wikiartTest required the full 124k-image corpus (SURVEY §4); here
the manifest/naming/blacklist/split logic is tested hermetically with fixtures.
"""

import csv

import numpy as np
import PIL.Image
import pytest

from realtime_style_transfer_tpu.config import ShapeConfig
from realtime_style_transfer_tpu.data import wikiart


@pytest.fixture()
def fake_corpus(tmp_path, monkeypatch, rng):
    """Synthetic manifest + matching image files in a temp style dir."""
    style_dir = tmp_path / "wikiart"
    image_dir = style_dir / "images"
    image_dir.mkdir(parents=True)
    manifest = style_dir / "wikiart_scraped.csv"
    rows = [
        {"Style": f"style{i}", "Artwork": f"art{i}", "Artist": f"artist{i}",
         "Date": str(1900 + i), "Link": f"http://example.com/{i}.jpg"}
        for i in range(10)
    ]
    with open(manifest, "w", newline="") as f:
        writer = csv.DictWriter(f, fieldnames=list(rows[0]))
        writer.writeheader()
        writer.writerows(rows)

    monkeypatch.setattr(wikiart, "STYLE_TARGET_DIR", style_dir)
    monkeypatch.setattr(wikiart, "STYLE_IMAGE_DIR", image_dir)
    monkeypatch.setattr(wikiart, "MANIFEST_FILEPATH", manifest)

    for row in rows:
        path = wikiart.image_manifest_to_filepath(row)
        arr = (rng.random((32, 48, 3)) * 255).astype(np.uint8)
        PIL.Image.fromarray(arr).save(path)
    return rows


def test_sha1_filename_is_row_hash(fake_corpus):
    import hashlib

    row = fake_corpus[0]
    path = wikiart.image_manifest_to_filepath(row)
    want = hashlib.sha1(str(row).encode("utf-8")).hexdigest()
    assert path.stem == want
    assert path.suffix == ".jpg"
    assert path.exists()


def test_manifest_roundtrip_and_reverse_lookup(fake_corpus):
    rows = list(wikiart.read_manifest())
    assert rows == fake_corpus
    h = wikiart.image_manifest_to_filepath(fake_corpus[3]).stem
    assert wikiart.lookup_manifest_by_hash(h) == fake_corpus[3]
    assert wikiart.lookup_manifest_by_hash("deadbeef") is None


def test_style_filepaths_blacklist_and_seed(fake_corpus, monkeypatch):
    all_paths = wikiart.style_filepaths()
    assert len(all_paths) == 10
    # blacklist one hash -> excluded
    banned = all_paths[0].stem
    monkeypatch.setattr(
        wikiart, "BLACKLISTED_IMAGE_HASHES", frozenset({banned})
    )
    filtered = wikiart.style_filepaths()
    assert len(filtered) == 9
    assert banned not in {p.stem for p in filtered}
    # seeded shuffle is deterministic
    a = wikiart.style_filepaths(seed=36)
    b = wikiart.style_filepaths(seed=36)
    assert a == b and a != sorted(a)


def test_get_dataset_with_local_styles(fake_corpus, tmp_path, rng):
    content_dir = tmp_path / "content"
    for sub in ("training", "validation"):
        (content_dir / sub).mkdir(parents=True)
        for i in range(2):
            arr = (rng.random((40, 60, 3)) * 255).astype(np.uint8)
            PIL.Image.fromarray(arr).save(content_dir / sub / f"{i}.png")

    cfg = ShapeConfig(resolution_divider=16, bottleneck_res_y=15,
                      bottleneck_num_filters=4, num_channels=3, hdr=False)
    make_train, make_val, n_train, n_val = wikiart.get_dataset(
        cfg, batch_size=2, content_dir=content_dir,
        style_paths=wikiart.style_filepaths(seed=1),
    )
    assert n_train == 2 and n_val == 2  # bounded by content per subset
    inputs, gt = next(iter(make_train()))
    assert inputs["content"].shape == (2, 60, 120, 3)
    assert inputs["style"].shape == (2, 1, 60, 120, 3)
    assert gt["content"].shape == (2, 60, 120, 3)
    # iterator factories restart cleanly
    again, _ = next(iter(make_train()))
    np.testing.assert_array_equal(inputs["content"], again["content"])


def test_get_hdr_dataset_wrapper(fake_corpus, tmp_path):
    """get_hdr_dataset injects the config channel list + HDR content dir
    (reference ``wikiart.py:220-235``) and pairs G-buffer sets with styles."""
    from realtime_style_transfer_tpu.data.exr import write_gbuffer_fixture

    cfg = ShapeConfig(resolution_divider=16, bottleneck_res_y=15,
                      bottleneck_num_filters=4, num_channels=6, hdr=True)
    content_dir = tmp_path / "hdr_content"
    for sub in ("training", "validation"):
        for i in range(2):
            write_gbuffer_fixture(
                content_dir / sub, f"shot{i}", cfg.channels, 24, 48, seed=i
            )
    make_train, _make_val, n_train, n_val = wikiart.get_hdr_dataset(
        cfg, batch_size=2, content_dir=content_dir,
        style_paths=wikiart.style_filepaths(seed=3),
    )
    assert n_train == 2 and n_val == 2
    inputs, gt = next(iter(make_train()))
    assert inputs["content"].shape == (2,) + cfg.content_shape  # 6 channels
    assert gt["content"].shape == (2,) + cfg.output_shape       # PNG truth


def test_get_dataset_split_uses_single_reference_shuffle(
    fake_corpus, tmp_path, monkeypatch
):
    """The 80/20 style split must be sorted -> ONE Random(seed).shuffle ->
    cut (reference ``wikiart.py:161-167``) — not shuffled twice."""
    import random

    cfg = ShapeConfig(resolution_divider=16, bottleneck_res_y=15,
                      bottleneck_num_filters=4, num_channels=3, hdr=False)
    content_dir = tmp_path / "content"
    for sub in ("training", "validation"):
        d = content_dir / sub
        d.mkdir(parents=True)
        arr = (np.zeros((40, 80, 3)) * 255).astype(np.uint8)
        import PIL.Image

        PIL.Image.fromarray(arr).save(d / "c.png")

    captured = {}
    orig = wikiart.style_filepaths

    def spy(seed=None):
        captured["seed"] = seed
        return orig(seed=seed)

    monkeypatch.setattr(wikiart, "style_filepaths", spy)
    wikiart.get_dataset(cfg, batch_size=1, seed=11, content_dir=content_dir)
    # the corpus list must come back unshuffled; split applies the one shuffle
    assert captured["seed"] is None

    # and the split itself matches the reference oracle exactly
    from realtime_style_transfer_tpu.data import pipeline as pl

    paths = orig()
    expect = list(paths)
    random.Random(11).shuffle(expect)
    cut = int(len(expect) * 0.8)
    train, val = pl.split_train_validation(paths, seed=11)
    assert (train, val) == (expect[:cut], expect[cut:])
