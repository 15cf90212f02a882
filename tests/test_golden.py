"""Golden-output regression test (the reference's acceptance-checkpoint role).

A fixed-seed tiny model on a fixed input must keep producing the committed
golden output — catches silent architecture/numerics drift.  Regenerate with
``python tests/test_golden.py`` after an INTENTIONAL change and commit the
updated ``tests/golden/`` artifact with an explanation.
"""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from realtime_style_transfer_tpu.config import ShapeConfig
from realtime_style_transfer_tpu.models.inference import make_inference_model

GOLDEN_DIR = Path(__file__).parent / "golden"
GOLDEN_PATH = GOLDEN_DIR / "tiny_inference_v1.npy"

CFG = ShapeConfig(
    resolution_divider=16, bottleneck_res_y=15, bottleneck_num_filters=4,
    num_channels=3, hdr=False, feature_extractor="dummy",
)


def _compute_output() -> np.ndarray:
    model = make_inference_model(CFG)
    h, w = CFG.input_dimensions
    yy, xx = np.meshgrid(np.linspace(0, 1, h), np.linspace(0, 1, w), indexing="ij")
    content = np.stack([yy, xx, yy * xx], axis=-1).astype(np.float32)[None]
    style = np.stack([xx, yy, (yy + xx) / 2], axis=-1).astype(np.float32)[None, None]
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(1234), jnp.asarray(content), jnp.asarray(style),
        train=False,
    )
    out = model.apply(variables, jnp.asarray(content), jnp.asarray(style))
    return np.asarray(out, dtype=np.float32)


def test_matches_committed_golden():
    assert GOLDEN_PATH.exists(), (
        "golden artifact missing; run `python tests/test_golden.py` and commit it"
    )
    golden = np.load(GOLDEN_PATH)
    out = _compute_output()
    assert out.shape == golden.shape
    np.testing.assert_allclose(out, golden, rtol=1e-4, atol=1e-4)


if __name__ == "__main__":
    import os

    os.environ["JAX_PLATFORMS"] = "cpu"
    jax.config.update("jax_platforms", "cpu")
    GOLDEN_DIR.mkdir(exist_ok=True)
    np.save(GOLDEN_PATH, _compute_output())
    print(f"wrote {GOLDEN_PATH}")
