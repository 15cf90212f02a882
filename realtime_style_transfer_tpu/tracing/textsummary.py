"""Model summary capture: param-tree tables as text.

Role of the reference's ``capture_model_summary`` (``tracing/textSummary.py:4-13``)
which stringified Keras ``model.summary()``; here we render the flax param pytree
(per-module parameter counts and shapes).
"""

from __future__ import annotations

from typing import Any, List

import jax
import numpy as np


def capture_model_summary(params: Any, detailed: bool = False) -> str:
    rows: List[str] = []
    total = 0
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        count = int(np.prod(leaf.shape)) if hasattr(leaf, "shape") else 1
        total += count
        if detailed:
            rows.append(f"{name:<80} {str(getattr(leaf, 'shape', ())):<20} {count:>12,}")
        else:
            rows.append(f"{name:<80} {count:>12,}")
    rows.append("-" * 94)
    rows.append(f"{'total parameters':<80} {total:>12,}")
    return "\n".join(rows)


def count_parameters(params: Any) -> int:
    return sum(
        int(np.prod(leaf.shape)) for leaf in jax.tree.leaves(params)
        if hasattr(leaf, "shape")
    )
