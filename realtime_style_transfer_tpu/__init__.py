"""realtime_style_transfer_tpu — TPU-native real-time style transfer framework.

A ground-up JAX/XLA/Pallas re-design with the capabilities of the reference
realtime-style-transfer project (Unreal G-buffer-conditioned artistic style
transfer with dual-style per-pixel blending).
"""

from .config import ShapeConfig  # noqa: F401

__version__ = "0.1.0"
