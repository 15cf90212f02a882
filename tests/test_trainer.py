"""End-to-end trainer tests: fixture data -> epochs -> callbacks -> resume.

The full slice the reference exercises in ``styleTransferTrainingModelTest.py`` (a
real fit on a tiny dataset with dummy backends) plus checkpoint/resume and the
observability sinks.
"""

import jax
import numpy as np
import pytest

from realtime_style_transfer_tpu.config import ShapeConfig
from realtime_style_transfer_tpu.data import pipeline
from realtime_style_transfer_tpu.models.training import (
    make_style_transfer_training_model,
)
from realtime_style_transfer_tpu.tracing import (
    CheckpointCallback,
    CheckpointManager,
    GradientsCallback,
    HistogramCallback,
    MetricsCallback,
    MetricsWriter,
    SummaryImageCallback,
    capture_model_summary,
    read_metrics,
)
from realtime_style_transfer_tpu.trainer import Trainer

TINY = ShapeConfig(
    resolution_divider=16, bottleneck_res_y=15, bottleneck_num_filters=4,
    num_channels=3, hdr=False, feature_extractor="dummy", with_depth_loss=False,
)


def _make_batches(cfg, n_batches=2, batch_size=2, seed=0):
    rng = np.random.default_rng(seed)
    batches = []
    for _ in range(n_batches):
        inputs = {
            name: rng.random((batch_size,) + shape, dtype=np.float32)
            for name, shape in cfg.input_shape.items()
        }
        gt = {"content": inputs["content"][..., :3], "style": inputs["style"]}
        batches.append((inputs, gt))
    return batches


@pytest.fixture(scope="module")
def training_model():
    return make_style_transfer_training_model(TINY, loss_extractor="dummy")


@pytest.mark.slow
def test_fit_with_all_callbacks_and_resume(tmp_path, training_model):
    tm = training_model
    batches = _make_batches(TINY)
    writer = MetricsWriter(tmp_path)
    ckpts = CheckpointManager(tmp_path, cadence=1, keep=2)
    trainer = Trainer(
        tm,
        log_dir=tmp_path,
        metrics_writer=writer,
        callbacks=[
            MetricsCallback(writer),
            CheckpointCallback(ckpts),
            SummaryImageCallback(tmp_path, tm, batches[0], batches[1]),
            HistogramCallback(writer, every=1),
            GradientsCallback(writer, tm, batches[0], every=1),
        ],
    )
    state = trainer.init_state(jax.random.PRNGKey(0))
    state = trainer.fit(
        state, lambda: iter(batches), lambda: iter(batches), epochs=2
    )
    assert int(jax.device_get(state.step)) == 4  # 2 epochs x 2 batches

    # metrics stream has train/val splits, weights/grad stats
    tags = set(read_metrics(tmp_path))
    assert any(t.startswith("training/loss") for t in tags)
    assert any(t.startswith("validation/loss") for t in tags)
    assert any(t.startswith("weights/") for t in tags)
    assert any(t.startswith("gradients/") for t in tags)
    assert any(t.endswith("prediction_time") for t in tags)

    # real histogram payloads (not just mean/var) for weights AND gradients
    import json

    hist_tags = set()
    with open(tmp_path / "metrics.jsonl") as f:
        for line in f:
            ev = json.loads(line)
            if "histogram" in ev:
                h = ev["histogram"]
                assert len(h["bucket"]) == len(h["bucket_limit"]) > 1
                assert sum(h["bucket"]) == h["num"] > 0
                hist_tags.add(ev["tag"])
    assert any(t.startswith("weights/") for t in hist_tags)
    assert any(t.startswith("gradients/") for t in hist_tags)

    # TensorBoard event file mirrors the stream
    from realtime_style_transfer_tpu.tracing.tensorboard import read_events

    event_files = sorted(tmp_path.glob("events.out.tfevents.*"))
    assert event_files
    events = read_events(event_files[0])
    kinds = {e.get("kind") for e in events}
    assert {"scalar", "histogram", "image"} <= kinds

    # image summaries on disk
    images = list((tmp_path / "images").glob("*.png"))
    assert any("prediction_00001" in p.name for p in images)
    assert any("style" in p.name for p in images)

    # resume: fresh trainer restores epoch 1 and continues from epoch 2
    state2 = trainer.init_state(jax.random.PRNGKey(1))
    restored, next_epoch = trainer.resume(state2, ckpts)
    assert next_epoch == 2
    np.testing.assert_allclose(
        float(jax.device_get(state.step)), float(jax.device_get(restored.step))
    )
    state3 = trainer.fit(
        restored, lambda: iter(batches), epochs=3, initial_epoch=next_epoch
    )
    assert int(jax.device_get(state3.step)) == 6
    ckpts.close()


def test_weights_export_loads_into_inference(tmp_path, training_model):
    from realtime_style_transfer_tpu.tracing.checkpoint import load_weights

    tm = training_model
    state = tm.init_state(jax.random.PRNGKey(0))
    ckpts = CheckpointManager(tmp_path, cadence=1)
    ckpts.save_weights(state)
    ckpts.wait()

    abstract = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype),
        {"params": jax.device_get(state.params),
         "batch_stats": jax.device_get(state.batch_stats)},
    )
    weights = load_weights(tmp_path, abstract)
    batch = _make_batches(TINY, n_batches=1)[0]
    from realtime_style_transfer_tpu.models.training import TrainState

    restored_state = TrainState(
        step=state.step, params=weights["params"],
        batch_stats=weights["batch_stats"], opt_state=state.opt_state,
    )
    pred = tm.predict(restored_state, batch[0])
    ref = tm.predict(state, batch[0])
    np.testing.assert_allclose(np.asarray(pred), np.asarray(ref), atol=1e-6)
    ckpts.close()


def test_capture_model_summary(training_model):
    state = training_model.init_state(jax.random.PRNGKey(0))
    text = capture_model_summary(state.params)
    assert "total parameters" in text
    assert "transfer" in text
