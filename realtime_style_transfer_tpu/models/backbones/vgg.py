"""VGG16 feature extractor in flax (perceptual-loss tower).

Architecture parity with ``tf.keras.applications.VGG16(include_top=False)`` as used
by the reference VGG loss model
(``/root/reference/realtime_style_transfer/models/styleLoss.py:69-109``): 13 conv
layers in 5 blocks with 2x2 max pools, named ``block{i}_conv{j}`` so the reference's
tap names work verbatim (style ``block1_conv2, block2_conv2, block3_conv3,
block4_conv3``; content ``block5_conv3``).

Callers apply caffe preprocessing (x255, RGB->BGR, mean subtraction) before this
module — see ``losses.vgg_preprocess`` — matching ``styleLoss.py:106-109``.

ImageNet weights are NOT bundled (zero-egress build); convert with
``tools/convert_keras_weights.py`` or substitute random features (tests use the dummy
loss model instead, as the reference does).
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

# filters per block; block i has len(entry) convs
VGG16_BLOCKS: Tuple[Tuple[int, ...], ...] = (
    (64, 64),
    (128, 128),
    (256, 256, 256),
    (512, 512, 512),
    (512, 512, 512),
)

STYLE_TAPS = ("block1_conv2", "block2_conv2", "block3_conv3", "block4_conv3")
CONTENT_TAPS = ("block5_conv3",)


class VGG16Features(nn.Module):
    """Returns (final_features, taps) for the requested layer names."""

    capture: Sequence[str] = STYLE_TAPS + CONTENT_TAPS
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        taps: Dict[str, jnp.ndarray] = {}
        x = x.astype(self.dtype)
        for bi, filters in enumerate(VGG16_BLOCKS, start=1):
            for ci, f in enumerate(filters, start=1):
                name = f"block{bi}_conv{ci}"
                x = nn.Conv(f, (3, 3), padding="SAME", dtype=self.dtype, name=name)(x)
                x = nn.relu(x)
                if name in self.capture:
                    taps[name] = x
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return x, taps
