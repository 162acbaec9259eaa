"""Max-of-set regression toy — the vendored demo notebook
(``set_transformer-master/max_regression_demo.ipynb``): predict max(set) with
a small Set Transformer (SAB×2 → PMA) vs DeepSet-style pooling (max / mean /
sum), comparing MAE learning curves.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn
import optax

from pcaudio.nn.attention import PMA, SAB


class SmallSetTransformer(nn.Module):
    """The notebook's model: SAB(64)×2 → PMA(1 seed) → Dense(1)."""

    dim_hidden: int = 64
    num_heads: int = 4

    @nn.compact
    def __call__(self, x, mask: Optional[jax.Array] = None):
        x = SAB(self.dim_hidden, self.num_heads, name="sab0")(x, mask=mask)
        x = SAB(self.dim_hidden, self.num_heads, name="sab1")(x, mask=mask)
        x = PMA(self.dim_hidden, self.num_heads, 1, name="pma")(x, mask=mask)
        return nn.Dense(1, name="out")(x)[:, 0, 0]


class SmallDeepSet(nn.Module):
    """Per-point MLP → pool (max/mean/sum) → MLP."""

    pool: str = "max"
    dim_hidden: int = 64

    @nn.compact
    def __call__(self, x, mask: Optional[jax.Array] = None):
        x = nn.relu(nn.Dense(self.dim_hidden)(x))
        x = nn.relu(nn.Dense(self.dim_hidden)(x))
        if self.pool == "max":
            x = jnp.max(x, axis=-2)
        elif self.pool == "mean":
            x = jnp.mean(x, axis=-2)
        elif self.pool == "sum":
            x = jnp.sum(x, axis=-2)
        else:
            raise ValueError(self.pool)
        x = nn.relu(nn.Dense(self.dim_hidden)(x))
        return nn.Dense(1)(x)[:, 0]


def sample_batch(key, batch_size: int = 64, set_size: int = 10):
    x = jax.random.normal(key, (batch_size, set_size, 1)) * 2.0
    return x, jnp.max(x[..., 0], axis=-1)


def train(model, *, steps: int = 500, lr: float = 1e-3, seed: int = 0,
          log=None):
    """Train on the max-regression task; returns (params, final MAE)."""
    key = jax.random.key(seed)
    params = model.init(key, jnp.zeros((1, 10, 1)))
    optimizer = optax.adam(lr)
    opt_state = optimizer.init(params)

    @jax.jit
    def step(params, opt_state, key):
        x, y = sample_batch(key)

        def loss_fn(p):
            return jnp.mean(jnp.abs(model.apply(p, x) - y))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state2 = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state2, loss

    loss = None
    for t in range(steps):
        key, sub = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, sub)
        if log and t % 100 == 0:
            log(f"step {t}: MAE {float(loss):.4f}")
    return params, float(loss)
