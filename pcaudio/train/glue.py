"""Adapters binding the model zoo to the generic train/eval steps."""
from __future__ import annotations

from typing import Optional

import jax

Array = jax.Array


def pointcloud_apply(model):
    """For set models (ST / SetTransformer / DeepSet): batch keys ``points``
    ``[B, K, d]``, optional ``mask`` ``[B, K]``, ``labels`` ``[B]``."""

    def apply_fn(params, batch, rng: Optional[Array]):
        return model.apply(params, batch["points"], mask=batch.get("mask"))

    return apply_fn


def dropout_apply(model, input_key: str = "x"):
    """For BaselineFF / CNNClassifier: input dropout active when an rng is
    provided (training), deterministic otherwise (eval) — mirroring the
    reference's model.train()/model.eval() switches."""

    def apply_fn(params, batch, rng: Optional[Array]):
        if rng is None:
            return model.apply(params, batch[input_key], deterministic=True)
        return model.apply(
            params, batch[input_key], deterministic=False, rngs={"dropout": rng}
        )

    return apply_fn
