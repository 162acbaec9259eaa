"""Amortized mixture-of-Gaussians clustering — the vendored library's demo
task (``set_transformer-master/run.py`` + ``mixture_of_mvns.py`` +
``mvn_diag.py``), JAX-native.

A set model reads N points and emits K component parameter vectors
``[K, 1 + 2·dim]`` parsed as (logit π, μ, softplus σ); the loss is the
negative mixture log-likelihood of the observed set.  Benchmark mode compares
the model's likelihood against the generating ("oracle") parameters on a
fixed sampled benchmark, as ``run.py:113-135`` does.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pcaudio.nn import DeepSet, SetTransformer
from pcaudio.train.step import TrainState

Array = jax.Array


def sample_mog(
    key: Array, B: int, N: int, K: int, dim: int = 2,
) -> Tuple[Array, Array, Array, Tuple[Array, Array]]:
    """Sample B mixture problems (``mvn_diag.py:10-22`` generative process):
    π ~ Dirichlet(1), per-point labels ~ Cat(π), μ ~ U(-4, 4), σ = 0.3.

    Returns ``(X [B,N,dim], labels [B,N], pi [B,K], (mu [B,K,dim], sigma))``.
    """
    k_pi, k_lab, k_mu, k_eps = jax.random.split(key, 4)
    pi = jax.random.dirichlet(k_pi, jnp.ones(K), (B,))
    labels = jax.random.categorical(
        k_lab, jnp.log(pi + 1e-12)[:, None, :], axis=-1, shape=(B, N)
    )
    mu = -4.0 + 8.0 * jax.random.uniform(k_mu, (B, K, dim))
    sigma = 0.3 * jnp.ones((B, K, dim))
    eps = jax.random.normal(k_eps, (B, N, dim))
    X = jnp.take_along_axis(mu, labels[..., None], axis=1) + eps * 0.3
    return X, labels, pi, (mu, sigma)


def diag_mvn_log_prob(X: Array, mu: Array, sigma: Array) -> Array:
    """Per-component diagonal-Gaussian log density: ``X [B,N,d]``,
    ``mu/sigma [B,K,d]`` → ``[B,N,K]`` (``mvn_diag.py:24-33``)."""
    diff = X[:, :, None, :] - mu[:, None, :, :]
    s = sigma[:, None, :, :]
    ll = (-0.5 * jnp.log(2.0 * jnp.pi) - jnp.log(s)
          - 0.5 * (diff / s) ** 2)
    return jnp.sum(ll, axis=-1)


def mog_log_likelihood(
    X: Array, pi: Array, mu: Array, sigma: Array,
    return_labels: bool = False,
):
    """Mean mixture log-likelihood (``mixture_of_mvns.py:39-46``)."""
    ll = diag_mvn_log_prob(X, mu, sigma) + jnp.log(pi + 1e-10)[:, None, :]
    out = jnp.mean(jax.scipy.special.logsumexp(ll, axis=-1))
    if return_labels:
        return out, jnp.argmax(ll, axis=-1)
    return out


def parse_raw(raw: Array, dim: int):
    """Network output ``[B, K, 1+2·dim]`` → (π, μ, σ) (``mvn_diag.py:39-42``)."""
    pi = jax.nn.softmax(raw[..., 0], axis=-1)
    mu = raw[..., 1: 1 + dim]
    sigma = jax.nn.softplus(raw[..., 1 + dim:])
    return pi, mu, sigma


@dataclasses.dataclass
class ClusteringConfig:
    """Mirror of the reference CLI (``run.py:17-32`` defaults)."""

    model: str = "set_transformer"  # or "deepset"
    K: int = 4
    dim: int = 2
    N_min: int = 100
    N_max: int = 500
    B: int = 10
    num_steps: int = 50000
    lr: float = 1e-3


def build(cfg: ClusteringConfig):
    out_per_k = 1 + 2 * cfg.dim
    if cfg.model == "set_transformer":
        model = SetTransformer(dim_input=cfg.dim, num_outputs=cfg.K,
                               dim_output=out_per_k, num_inds=32,
                               dim_hidden=128, num_heads=4, ln=True)
    elif cfg.model == "deepset":
        model = DeepSet(dim_input=cfg.dim, num_outputs=cfg.K,
                        dim_output=out_per_k, dim_hidden=256)
    else:
        raise ValueError(cfg.model)
    params = model.init(jax.random.key(0), jnp.zeros((1, 8, cfg.dim)))
    # reference: lr steps ×0.1 at 50% of training (run.py:86-87)
    sched = optax.piecewise_constant_schedule(
        cfg.lr, {cfg.num_steps // 2: 0.1})
    optimizer = optax.adam(sched)
    return model, optimizer, params


def make_train_step(model, optimizer, cfg: ClusteringConfig):
    @jax.jit
    def step(state: TrainState, X: Array, rng: Array):
        def loss_fn(params):
            raw = model.apply(params, X)
            pi, mu, sigma = parse_raw(raw, cfg.dim)
            return -mog_log_likelihood(X, pi, mu, sigma)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (TrainState(params=params, opt_state=opt_state,
                           step=state.step + 1), loss)

    return step


def train(cfg: ClusteringConfig, *, num_steps: Optional[int] = None,
          seed: int = 0, log_every: int = 1000, log=print,
          checkpoint_dir: Optional[str] = None,
          checkpoint_every: Optional[int] = None):
    """Train the amortized clusterer on freshly sampled mixtures each step
    (N drawn uniformly in [N_min, N_max], ``run.py`` semantics, including its
    periodic checkpointing — ``run.py:105-110`` saves .tar snapshots; here
    orbax)."""
    model, optimizer, params = build(cfg)
    state = TrainState.create(params, optimizer)
    step_fn = make_train_step(model, optimizer, cfg)
    rng = np.random.default_rng(seed)
    key = jax.random.key(seed)
    steps = num_steps if num_steps is not None else cfg.num_steps
    for t in range(steps):
        N = int(rng.integers(cfg.N_min, cfg.N_max + 1))
        key, sub = jax.random.split(key)
        X, *_ = sample_mog(sub, cfg.B, N, cfg.K, cfg.dim)
        key, sub = jax.random.split(key)
        state, loss = step_fn(state, X, sub)
        if t % log_every == 0:
            log(f"step {t}: -ll {float(loss):.4f}")
        if checkpoint_dir and checkpoint_every and (t + 1) % checkpoint_every == 0:
            from pcaudio.checkpoint.orbax_io import save_checkpoint

            save_checkpoint(checkpoint_dir, jax.device_get(state.params),
                            None, step=t + 1)
    return model, state


def benchmark(model, params, cfg: ClusteringConfig, *, num_batches: int = 100,
              seed: int = 1):
    """Model vs oracle likelihood on a fixed benchmark (``run.py:113-135``).
    Returns ``(model_ll, oracle_ll)`` (higher is better)."""
    key = jax.random.key(seed)
    model_ll, oracle_ll = [], []

    @jax.jit
    def eval_one(params, X, pi, mu, sigma):
        raw = model.apply(params, X)
        ppi, pmu, psigma = parse_raw(raw, cfg.dim)
        return (mog_log_likelihood(X, ppi, pmu, psigma),
                mog_log_likelihood(X, pi, mu, sigma))

    for _ in range(num_batches):
        key, sub = jax.random.split(key)
        X, _, pi, (mu, sigma) = sample_mog(sub, cfg.B, cfg.N_max, cfg.K, cfg.dim)
        m, o = eval_one(params, X, pi, mu, sigma)
        model_ll.append(float(m))
        oracle_ll.append(float(o))
    return float(np.mean(model_ll)), float(np.mean(oracle_ll))
