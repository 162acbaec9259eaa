"""ModelNet40 classification recipe — the generic set-encoder cross-check.

Re-implementation of ``set_transformer-master/main_pointcloud.py``: the
ModelNet40 ``SetTransformer`` variant (ISAB×2 → Dropout → PMA → Dropout →
Dense, ``:13-37``), Adam with a ×0.1 decay step (the reference's training
setup), metrics streamed to the JSONL metrics writer instead of TensorBoard.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pcaudio.data.modelnet40 import ModelNet40Fetcher
from pcaudio.nn import SetTransformer
from pcaudio.train.step import TrainState


@dataclasses.dataclass
class ModelNet40Config:
    """Mirror of the reference CLI (``main_pointcloud.py:40-48``)."""

    num_pts: int = 1000
    learning_rate: float = 1e-3
    batch_size: int = 64
    dim: int = 256
    n_heads: int = 4
    n_anc: int = 16
    train_epochs: int = 2000
    dim_output: int = 40

    @property
    def exp_name(self) -> str:
        return (f"N{self.num_pts}_d{self.dim}h{self.n_heads}i{self.n_anc}"
                f"_lr{self.learning_rate}bs{self.batch_size}")


def build(cfg: ModelNet40Config):
    """(model, optimizer, init_params)."""
    model = SetTransformer(
        dim_input=3, num_outputs=1, dim_output=cfg.dim_output,
        num_inds=cfg.n_anc, dim_hidden=cfg.dim, num_heads=cfg.n_heads,
        pointcloud_variant=True,
    )
    params = model.init(
        {"params": jax.random.key(0)}, jnp.zeros((1, 16, 3)),
        deterministic=True,
    )
    optimizer = optax.adam(cfg.learning_rate)
    return model, optimizer, params


def make_steps(model, optimizer):
    @jax.jit
    def train_step(state: TrainState, clouds, labels, rng):
        def loss_fn(params):
            logits = model.apply(params, clouds, deterministic=False,
                                 rngs={"dropout": rng})
            loss = optax.softmax_cross_entropy_with_integer_labels(
                logits, labels).mean()
            acc = jnp.mean((jnp.argmax(logits, -1) == labels).astype(jnp.float32))
            return loss, acc

        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (TrainState(params=params, opt_state=opt_state,
                           step=state.step + 1),
                {"loss": loss, "accuracy": acc})

    @jax.jit
    def eval_step(params, clouds, labels):
        logits = model.apply(params, clouds, deterministic=True)
        correct = jnp.sum((jnp.argmax(logits, -1) == labels).astype(jnp.int32))
        return correct, labels.shape[0]

    return train_step, eval_step


def train(
    cfg: ModelNet40Config,
    data_path: str,
    *,
    epochs: Optional[int] = None,
    eval_every: int = 10,
    metrics=None,
    seed: int = 0,
    log=print,
):
    """Full training run on a ModelNet40 h5 file; returns (state, history)."""
    fetcher = ModelNet40Fetcher(
        data_path, cfg.batch_size,
        down_sample=max(1, int(10000 / cfg.num_pts)),
        do_standardize=True, do_augmentation=(cfg.num_pts == 5000), seed=seed,
    )
    model, optimizer, params = build(cfg)
    state = TrainState.create(params, optimizer)
    train_step, eval_step = make_steps(model, optimizer)
    rng = jax.random.key(seed)
    history = []
    for epoch in range(epochs if epochs is not None else cfg.train_epochs):
        losses, accs = [], []
        for clouds, _, labels in fetcher.train_data():
            rng, sub = jax.random.split(rng)
            state, m = train_step(state, jnp.asarray(clouds),
                                  jnp.asarray(labels), sub)
            losses.append(float(m["loss"]))
            accs.append(float(m["accuracy"]))
        rec = {"epoch": epoch, "train_loss": float(np.mean(losses)),
               "train_accuracy": float(np.mean(accs))}
        if epoch % eval_every == 0:
            correct = total = 0
            for clouds, _, labels in fetcher.test_data():
                c, t = eval_step(state.params, jnp.asarray(clouds),
                                 jnp.asarray(labels))
                correct, total = correct + int(c), total + int(t)
            rec["test_accuracy"] = correct / max(total, 1)
        history.append(rec)
        if metrics is not None:
            metrics.write(rec)
        log(f"epoch {epoch}: loss {rec['train_loss']:.3f} "
            f"acc {rec['train_accuracy']:.3f}"
            + (f" test {rec['test_accuracy']:.3f}" if "test_accuracy" in rec else ""))
    return state, history
