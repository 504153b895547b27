"""Parameter summaries — the reference's trainable-variable printout
(``/root/reference/1DTFIM/TrainingRNN_1DTFIM.py:127-136``) as a utility."""

from __future__ import annotations

from typing import Any

import jax
import numpy as np


def param_count(params: Any) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))


def summarize_params(params: Any) -> str:
    """Per-leaf shapes plus the total, as a printable table."""
    lines = []
    flat, _ = jax.tree_util.tree_flatten_with_path(params)
    for path, leaf in flat:
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        lines.append(f"{name:40s} {str(tuple(leaf.shape)):16s} {leaf.dtype}")
    lines.append(f"The number of params is {param_count(params)}")
    return "\n".join(lines)
