"""Shared CLI plumbing: config flags, model construction, weight loading.

The reference's entry points are 13 repo-root scripts with per-script argparse
(SURVEY §2.5).  This module centralizes what they share so each script stays a thin
shell: spec-string config (``rst-<resx>-<by>-<bf>-<ch>``), inference-model build,
weights restore (``weights/latest_epoch_weights`` artifact), image io.
"""

from __future__ import annotations

import argparse
import logging
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

log = logging.getLogger(__name__)


def add_config_args(parser: argparse.ArgumentParser, *, default_styles: int = 1):
    parser.add_argument(
        "--network_spec", type=str, default=None,
        help="rst-<res_x>-<bottleneck_y>-<filters>-<channels>, e.g. rst-960-120-128-17",
    )
    parser.add_argument("--num_styles", type=int, default=default_styles)
    parser.add_argument("--sdr", action="store_true", help="RGB-only content input")
    parser.add_argument(
        "--dtype", choices=["float32", "bfloat16"], default="bfloat16",
        help="compute dtype for the network",
    )


def config_from_args(args, *, num_styles: Optional[int] = None):
    from .config import ShapeConfig

    n = num_styles if num_styles is not None else getattr(args, "num_styles", 1)
    hdr = not getattr(args, "sdr", False)
    if args.network_spec:
        return ShapeConfig.from_spec(args.network_spec, num_styles=n, hdr=hdr)
    return ShapeConfig(num_styles=n, hdr=hdr)


def compute_dtype(args):
    import jax.numpy as jnp

    return jnp.bfloat16 if getattr(args, "dtype", "bfloat16") == "bfloat16" else jnp.float32


def build_inference(config, *, dtype=None, rng_seed: int = 0):
    """Build the inference module + randomly-initialized variables (jitted init)."""
    import jax
    import jax.numpy as jnp

    from .models.inference import make_inference_model

    model = make_inference_model(config, dtype=dtype or jnp.float32)
    element, _ = config.get_dummy_input_element()
    kwargs = {}
    if "style_weights" in element:
        kwargs["style_weights"] = jnp.asarray(element["style_weights"])
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(rng_seed),
        jnp.asarray(element["content"]),
        jnp.asarray(element["style"]),
        train=False,
        **kwargs,
    )
    return model, variables


def load_variables(checkpoint_dir, variables):
    """Restore params/batch_stats from a run or weights dir into ``variables``."""
    import jax

    from .tracing.checkpoint import load_weights

    target = {
        "params": jax.device_get(variables["params"]),
        "batch_stats": jax.device_get(variables.get("batch_stats", {})),
    }
    abstract = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), target
    )
    restored = load_weights(checkpoint_dir, abstract)
    out = dict(variables)
    out["params"] = restored["params"]
    if restored.get("batch_stats"):
        out["batch_stats"] = restored["batch_stats"]
    return out


def load_content(path: Path, config) -> np.ndarray:
    """Load content input: HDR G-buffer set (PNG+EXRs) or plain RGB image."""
    from .data.hdr_screenshots import load_unreal_hdr_screenshot
    from .data.imaging import load_image, preprocess_numpy_image

    path = Path(path)
    if config.hdr and config.total_channels > 3:
        stacked = load_unreal_hdr_screenshot(path, config.channels)
        return preprocess_numpy_image(stacked, config.content_shape)
    return load_image(path, config.content_shape)


def load_styles(style_paths, config) -> np.ndarray:
    from .data.imaging import load_image

    styles = [load_image(p, config.output_shape) for p in style_paths]
    return np.stack(styles, axis=0)  # (num_styles, H, W, 3)


def save_image(tensor01, out_path: Path) -> Path:
    from .data.imaging import tensor_to_image

    out_path = Path(out_path)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    tensor_to_image(np.asarray(tensor01)).save(out_path)
    log.info("wrote %s", out_path)
    return out_path


def default_log_dir(base: str = "logs") -> Path:
    import datetime

    stamp = datetime.datetime.now().strftime("%Y-%m-%d-%H-%M-%S")
    return Path(base) / stamp
