"""Epoch driver: shuffled minibatches, periodic eval, checkpointing.

Replaces the reference's per-script loops (``Code/settransformer.py:96-131``:
500 epochs, test every 10, print metrics, save once at the end) with one
driver that also does what the reference can't: periodic orbax checkpoints
with resume (SURVEY.md §5 failure recovery) and mesh-sharded batches.
"""
from __future__ import annotations

import time
from typing import Any, Callable, Dict, List, Optional

import jax
import numpy as np

from pcaudio.train.step import TrainState


def _mean(xs) -> float:
    """Mean of per-step metrics with ONE device fetch for device scalars."""
    if xs and isinstance(xs[0], jax.Array):
        import jax.numpy as jnp

        return float(jnp.stack(xs).mean())
    return float(np.mean(xs))


def _batches(n: int, batch_size: int, rng: np.random.Generator,
             drop_remainder: bool = True):
    order = rng.permutation(n)
    end = (n // batch_size) * batch_size if drop_remainder else n
    for i in range(0, end, batch_size):
        yield order[i: i + batch_size]


def fit(
    state: TrainState,
    train_step: Callable,
    data: Dict[str, np.ndarray],
    *,
    batch_size: int,
    epochs: int,
    seed: int = 0,
    eval_data: Optional[Dict[str, np.ndarray]] = None,
    eval_step: Optional[Callable] = None,
    eval_every: int = 10,
    device_resident: Optional[bool] = None,
    mesh=None,
    shard_set_axis: bool = False,
    checkpoint_dir: Optional[str] = None,
    checkpoint_every: Optional[int] = None,
    config=None,
    log: Callable[[str], None] = print,
) -> tuple:
    """Run the training loop; returns ``(state, history)``.

    ``data``/``eval_data`` are dicts of equal-leading-dim host arrays (must
    include ``labels``).  ``train_step(state, batch, rng)`` is the (jitted)
    step; ``eval_step(params, batch) -> (correct, total)``.
    """
    from pcaudio.parallel.mesh import shard_batch

    n = len(data["labels"])
    rng = np.random.default_rng(seed)
    history: List[Dict[str, Any]] = []

    if device_resident and mesh is not None:
        raise ValueError(
            "device_resident=True is incompatible with a mesh: mesh batches "
            "are placed per-step by shard_batch. Pass device_resident=False "
            "(or None) when training over a mesh."
        )
    if device_resident is None:
        # Default device-resident only when the dataset plausibly fits next
        # to the model in HBM (leave half the device memory for activations
        # and params); oversized corpora stay host-resident.
        if mesh is None:
            nbytes = sum(int(v.nbytes) for v in data.values())
            if eval_data is not None:
                nbytes += sum(int(v.nbytes) for v in eval_data.values())
            try:
                stats = jax.devices()[0].memory_stats() or {}
                budget = stats.get("bytes_limit", 8 << 30) // 2
            except Exception:
                budget = 4 << 30
            device_resident = nbytes <= budget
        else:
            device_resident = False
    if device_resident and mesh is None:
        # Stage the dataset on device ONCE; per-batch `v[idx]` is then an
        # on-device gather (idx upload is bytes).  The host-resident path
        # re-ships the whole epoch over H2D — measured 45 s/epoch vs <2 s
        # on the tunneled chip for the synthetic FST corpus (~1 GB/epoch).
        import jax.numpy as jnp

        data = {k: jnp.asarray(v) for k, v in data.items()}
        if eval_data is not None:
            eval_data = {k: jnp.asarray(v) for k, v in eval_data.items()}

    def place(batch):
        if mesh is not None:
            return shard_batch(mesh, batch, shard_set_axis=shard_set_axis)
        return batch

    step_rng = jax.random.key(seed)
    for epoch in range(epochs):
        t0 = time.perf_counter()
        losses, accs = [], []
        for idx in _batches(n, batch_size, rng):
            batch = place({k: v[idx] for k, v in data.items()})
            step_rng, sub = jax.random.split(step_rng)
            state, metrics = train_step(state, batch, sub)
            losses.append(metrics["loss"])
            accs.append(metrics["accuracy"])
        # one device sync per epoch, not one (or two) per step: the per-step
        # metrics stay as device scalars so steps dispatch asynchronously
        rec = {
            "epoch": epoch,
            "train_loss": _mean(losses),
            "train_accuracy": _mean(accs),
            "seconds": time.perf_counter() - t0,
        }
        if eval_data is not None and eval_step is not None and epoch % eval_every == 0:
            correct = total = 0
            ne = len(eval_data["labels"])
            for i in range(0, ne - batch_size + 1, batch_size):
                batch = place({k: v[i: i + batch_size] for k, v in eval_data.items()})
                c, t = eval_step(state.params, batch)
                correct += int(c)
                total += int(t)
            rec["test_accuracy"] = correct / max(total, 1)
        history.append(rec)
        msg = (f"Epoch {epoch}: train loss {rec['train_loss']:.3f} "
               f"train acc {rec['train_accuracy']:.3f}")
        if "test_accuracy" in rec:
            msg += f" test acc {rec['test_accuracy']:.3f}"
        log(msg)
        if checkpoint_dir and checkpoint_every and (epoch + 1) % checkpoint_every == 0:
            from pcaudio.checkpoint.orbax_io import save_checkpoint

            save_checkpoint(checkpoint_dir, jax.device_get(state.params),
                            config, step=epoch + 1)
    return state, history
