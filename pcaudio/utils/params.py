"""Parameter counting and display (reference ``Code/utils.py:7-20``,
minus the prettytable dependency)."""
from __future__ import annotations

from typing import Any, List, Tuple

import jax
import numpy as np


def named_parameters(params: Any) -> List[Tuple[str, int]]:
    """Flatten a flax params pytree to (dotted-name, size) rows."""
    flat, _ = jax.tree_util.tree_flatten_with_path(params)
    rows = []
    for path, leaf in flat:
        name = ".".join(
            getattr(k, "key", getattr(k, "name", str(k))) for k in path
        )
        rows.append((name, int(np.prod(np.shape(leaf)))))
    return rows


def count_parameters(params: Any, display: bool = True) -> int:
    """Print a per-module table and return the trainable-parameter total —
    same contract as the reference's ``count_parameters``."""
    rows = named_parameters(params)
    total = sum(n for _, n in rows)
    if display:
        width = max((len(n) for n, _ in rows), default=7)
        print(f"{'Modules'.ljust(width)} | Parameters")
        print("-" * (width + 13))
        for name, n in rows:
            print(f"{name.ljust(width)} | {n}")
        print(f"Total Trainable Params: {total}")
    return total
