"""Numerical-debugging utilities (SURVEY.md §5 race-detection analogue: the
hazards in a jit/SPMD world are NaNs, non-finite grads, and impure functions,
not data races)."""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def enable_nan_debugging(enable: bool = True) -> None:
    """Turn on jax's NaN checker (errors at the op that produced a NaN)."""
    jax.config.update("jax_debug_nans", enable)


def assert_finite_tree(tree: Any, name: str = "tree") -> None:
    """Raise with the offending leaf path if any value is non-finite."""
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    for path, leaf in flat:
        arr = np.asarray(leaf)
        if not np.isfinite(arr).all():
            p = "/".join(str(getattr(k, "key", k)) for k in path)
            bad = int((~np.isfinite(arr)).sum())
            raise FloatingPointError(
                f"{name}{'/' + p if p else ''}: {bad} non-finite values "
                f"(shape {arr.shape})"
            )


def check_jit_purity(fn, *args, atol: float = 0.0) -> bool:
    """A function traced twice must produce identical outputs — catches
    accidental Python-side state (the jit analogue of a determinism check)."""
    a = jax.jit(fn)(*args)
    b = jax.jit(fn)(*args)
    ok = True
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        if not np.allclose(np.asarray(x), np.asarray(y), atol=atol, rtol=0):
            ok = False
    return ok
