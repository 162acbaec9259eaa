"""Jitted train/eval steps with mesh data-parallelism.

Replaces the reference's per-script epoch loops (``Code/settransformer.py:96-131``
and siblings): one traced+compiled step, cross-entropy on the model output
(faithful to torch ``CrossEntropyLoss`` — for the FB baseline the output is
already softmaxed, reproducing its double-softmax training quirk,
``Code/models.py:75``), gradients reduced across the ``data`` mesh axis by
XLA's SPMD partitioner (the DataParallel replacement, SURVEY.md §5).
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pcaudio.parallel.mesh import DATA_AXIS, SET_AXIS

Array = jax.Array
Batch = Dict[str, Array]
ApplyFn = Callable[[Any, Batch, Optional[Array]], Array]


@struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: Array

    @classmethod
    def create(cls, params, optimizer: optax.GradientTransformation) -> "TrainState":
        return cls(
            params=params,
            opt_state=optimizer.init(params),
            step=jnp.zeros((), jnp.int32),
        )


def make_train_step(
    apply_fn: ApplyFn, optimizer: optax.GradientTransformation,
    remat: bool = False,
) -> Callable[[TrainState, Batch, Array], Tuple[TrainState, Dict[str, Array]]]:
    """Build an un-jitted train step.

    ``apply_fn(params, batch, rng) -> logits [B, nclass]``; ``batch`` must
    contain integer ``labels [B]``.

    ``remat=True`` wraps the forward in ``jax.checkpoint`` — activations are
    recomputed in the backward pass instead of stored, trading FLOPs for HBM
    so large point budgets / batch sizes fit (SURVEY.md's HBM guidance; the
    reference has no equivalent — it just OOMs).
    """
    fwd = jax.checkpoint(apply_fn, static_argnums=()) if remat else apply_fn

    def step(state: TrainState, batch: Batch, rng: Array):
        def loss_fn(params):
            logits = fwd(params, batch, rng)
            loss = optax.softmax_cross_entropy_with_integer_labels(
                logits, batch["labels"]
            ).mean()
            acc = jnp.mean(
                (jnp.argmax(logits, -1) == batch["labels"]).astype(jnp.float32)
            )
            return loss, acc

        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params=params, opt_state=opt_state, step=state.step + 1)
        return new_state, {"loss": loss, "accuracy": acc}

    return step


def make_eval_step(apply_fn: ApplyFn):
    """Eval step returning per-batch (correct_count, total) — accumulated on
    the host like the reference eval loops (``Code/pceval.py:89-100``)."""

    def step(params, batch: Batch):
        logits = apply_fn(params, batch, None)
        correct = jnp.sum(
            (jnp.argmax(logits, -1) == batch["labels"]).astype(jnp.int32)
        )
        return correct, batch["labels"].shape[0]

    return step


def jit_train_step(
    step,
    mesh: Optional[Mesh] = None,
    donate_state: bool = True,
):
    """Jit a train step, optionally over a mesh.

    With a mesh: parameters/optimizer state replicated, batch sharded on
    ``data`` (and the point axis optionally on ``set``).  XLA inserts the
    gradient ``psum`` over ICI — no hand-written collectives needed for DP.
    """
    if mesh is None:
        return jax.jit(step, donate_argnums=(0,) if donate_state else ())

    repl = NamedSharding(mesh, P())
    # State and rng replicated; the batch keeps whatever sharding the caller
    # placed it with (pcaudio.parallel.shard_batch: data axis over DP, point
    # axis optionally over the set axis) — XLA's partitioner propagates it.
    return jax.jit(
        step,
        in_shardings=(repl, None, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,) if donate_state else (),
    )
