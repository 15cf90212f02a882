#!/usr/bin/env python
"""Visualize a raw tensor buffer dumped by the Unreal plugin.

Parity with the reference's ``show_unreal_tensor_buffer.py``: interpret the raw
float32 stream as an image tensor and write/show it.

    python show_unreal_tensor_buffer.py buffer.bin --shape 960 1920 3 -o out/buf.png
"""

from __future__ import annotations

import argparse
import logging
from pathlib import Path

import numpy as np

from realtime_style_transfer_tpu import cli
from realtime_style_transfer_tpu.tracing import logsetup

log = logging.getLogger("show_tensor_buffer")


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("buffer", type=Path)
    p.add_argument("--shape", type=int, nargs=3, default=(960, 1920, 3),
                   metavar=("H", "W", "C"))
    p.add_argument("-o", "--output", type=Path, default=None,
                   help="write a PNG instead of showing a window")
    return p.parse_args()


def main():
    args = parse_args()
    logsetup.setup()

    from realtime_style_transfer_tpu.data.native import read_tensor_buffer
    from realtime_style_transfer_tpu.utils import comparison_table

    tensor = read_tensor_buffer(args.buffer, tuple(args.shape))
    print(comparison_table({"buffer": tensor}))
    if args.output is not None:
        cli.save_image(np.clip(tensor, 0.0, 1.0), args.output)
    else:
        import matplotlib.pyplot as plt

        plt.imshow(np.clip(tensor, 0.0, 1.0))
        plt.title(str(args.buffer))
        plt.show()


if __name__ == "__main__":
    main()
