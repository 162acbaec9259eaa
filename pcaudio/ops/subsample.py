"""Point-cloud subsampling policies: top-K, random-K, zero-replace, and
spectral-flux importance sampling — batched and jittable.

Re-designs the reference's per-sample numpy/torch host loops
(``Code/utils.py:25-106``, ``Code/dataset.py:102-316``) as device ops:
``jax.lax.top_k`` on the magnitude coordinate, Gumbel-top-K for uniform
sampling without replacement, and ``jax.random.categorical`` for the
multinomial importance sampler.  All take/return fixed shapes.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


# ---------- cloud-side (keep K points) ----------

def top_k_points(points: Array, k: int, value_axis: int = -1) -> Array:
    """Keep the K highest-magnitude points of each cloud.

    ``points [..., N, d]`` → ``[..., k, d]``, sorted by descending magnitude
    (coordinate ``value_axis`` of ``d``) — the order ``pc_maxK``
    (``Code/utils.py:25-53``) / ``ESC_pc_temp_maxKSS``
    (``Code/dataset.py:169-202``) produce.
    """
    mags = points[..., value_axis]
    _, idx = jax.lax.top_k(mags, k)  # [..., k]
    return jnp.take_along_axis(points, idx[..., None], axis=-2)


def rand_k_points(key: Array, points: Array, k: int) -> Array:
    """Keep K uniformly-random points without replacement (Gumbel-top-K on
    i.i.d. noise ≡ uniform K-subset), matching ``pc_randK``
    (``Code/utils.py:55-82``) / ``ESC_pc_temp_randKSS``
    (``Code/dataset.py:205-238``) in distribution."""
    n = points.shape[-2]
    noise = jax.random.uniform(key, points.shape[:-2] + (n,))
    _, idx = jax.lax.top_k(noise, k)
    return jnp.take_along_axis(points, idx[..., None], axis=-2)


def top_k_points_masked(
    points: Array, mask: Array, k: int, value_axis: int = -1
) -> Tuple[Array, Array]:
    """Masked top-K for fixed-budget padded clouds: invalid points never
    selected.  Returns ``(points [..., k, d], mask [..., k])`` — the out-mask
    flags selections that were real (fewer than k valid points ⇒ padding)."""
    mags = points[..., value_axis]
    neg = jnp.finfo(mags.dtype).min
    _, idx = jax.lax.top_k(jnp.where(mask, mags, neg), k)
    out = jnp.take_along_axis(points, idx[..., None], axis=-2)
    out_mask = jnp.take_along_axis(mask, idx, axis=-1)
    return out, out_mask


def rand_k_points_masked(
    key: Array, points: Array, mask: Array, k: int
) -> Tuple[Array, Array]:
    """Masked uniform-K without replacement over valid points only."""
    n = points.shape[-2]
    noise = jax.random.uniform(key, points.shape[:-2] + (n,))
    noise = jnp.where(mask, noise, -1.0)
    _, idx = jax.lax.top_k(noise, k)
    out = jnp.take_along_axis(points, idx[..., None], axis=-2)
    out_mask = jnp.take_along_axis(mask, idx, axis=-1)
    return out, out_mask


# ---------- grid-side (zero out non-kept cells; baselines) ----------

def top_k_replace(x: Array, k: int) -> Array:
    """Zero all but the K largest entries along the last axis
    (``pc_maxK_replace``, ``Code/utils.py:86-95``)."""
    n = x.shape[-1]
    _, idx = jax.lax.top_k(x, k)
    keep = jnp.zeros_like(x, dtype=bool)
    keep = jnp.put_along_axis(keep, idx, True, axis=-1, inplace=False)
    return jnp.where(keep, x, 0.0)


def rand_k_replace(key: Array, x: Array, k: int) -> Array:
    """Zero all but K uniformly-random entries along the last axis
    (``pc_randK_replace``, ``Code/utils.py:97-106``)."""
    noise = jax.random.uniform(key, x.shape)
    _, idx = jax.lax.top_k(noise, k)
    keep = jnp.zeros_like(x, dtype=bool)
    keep = jnp.put_along_axis(keep, idx, True, axis=-1, inplace=False)
    return jnp.where(keep, x, 0.0)


def grid_top_k_replace(grid: Array, k: int, flag: str = "max", key: Array | None = None) -> Array:
    """CNN-baseline grid subsampling (``ESC_baseline_temporal_maxK``,
    ``Code/dataset.py:102-135``): keep the top-K (or random-K) cells of each
    ``[..., Nt, F]`` grid, zero the rest."""
    nt, f = grid.shape[-2], grid.shape[-1]
    flat = grid.reshape(grid.shape[:-2] + (nt * f,))
    if flag == "max":
        out = top_k_replace(flat, k)
    elif flag == "rand":
        assert key is not None, "rand flag requires a PRNG key"
        out = rand_k_replace(key, flat, k)
    else:
        raise ValueError(f"flag must be 'max' or 'rand', got {flag!r}")
    return out.reshape(grid.shape)


# ---------- spectral-flux importance sampling (rebuttal experiment) ----------

def _gradient_1d(x: Array, axis: int) -> Array:
    """torch.gradient semantics: central differences, one-sided edges
    (same as np.gradient; jnp.gradient matches)."""
    return jnp.gradient(x, axis=axis)


def _kaiser_discrete(n: int, beta: float, periodic: bool = True) -> Array:
    """torch.kaiser_window: symmetric length n+1 (periodic) with the last
    sample dropped."""
    m = n if periodic else n - 1
    k = jnp.arange(n, dtype=jnp.float32)
    x = 2.0 * k / m - 1.0 if m > 0 else jnp.zeros((n,), jnp.float32)
    w = jax.scipy.special.i0(beta * jnp.sqrt(jnp.clip(1.0 - x * x, 0.0, 1.0)))
    return w / jax.scipy.special.i0(jnp.asarray(beta))


def importance_heatmap(grid_tf: Array, win_f: int, beta: float = 5.09) -> Array:
    """Spectral-flux sampling heat-map (``Code/dataset.py:281-284``).

    On a ``[Nt, F]`` (frames-major) grid: ``g = |∂_f x| + |∂_t x|`` smoothed
    by a separable Kaiser kernel — extent 2 along frequency, ``win_f`` along
    time (the reference's ``kaiser(2)[:,None] @ kaiser(winF)[None,:]`` on its
    freq-major grid), cross-correlated with torch 'same' padding — plus 1e-6.
    """
    gf = jnp.abs(_gradient_1d(grid_tf, axis=-1))  # ∂ frequency
    gt = jnp.abs(_gradient_1d(grid_tf, axis=-2))  # ∂ time
    g = gf + gt
    kf = _kaiser_discrete(2, beta)       # frequency extent
    kt = _kaiser_discrete(win_f, beta)   # time extent
    # torch 'same' for even kernels pads (k-1)//2 before, k//2 after;
    # conv2d is cross-correlation, so no kernel flip.
    def corr1d(x, k, axis):
        klen = k.shape[0]
        pad = [(0, 0)] * x.ndim
        pad[axis] = ((klen - 1) // 2, klen // 2)
        xp = jnp.pad(x, pad)
        # windowed dot via gather
        n = x.shape[axis]
        starts = jnp.arange(n)
        idx = starts[:, None] + jnp.arange(klen)[None, :]
        xp_m = jnp.moveaxis(xp, axis, 0)
        win = xp_m[idx]  # [n, klen, ...]
        out = jnp.tensordot(win, k, axes=([1], [0]))  # [n, ...]
        return jnp.moveaxis(out, 0, axis)

    g = corr1d(g, kt, axis=-2)  # time axis
    g = corr1d(g, kf, axis=-1)  # frequency axis
    return g + 1.0e-6


def importance_indices(
    heat_tf: Array, k: int, choice: int, key: Array | None = None
) -> Array:
    """Select K flat indices from the heat-map, reproducing the reference's
    flat-index convention *including its index-space mismatch*: the heat is
    flattened frequency-major (``g.view(-1)`` of its ``[F, Nt]`` grid,
    ``Code/dataset.py:285-290``) while cloud rows are frequency-fastest, and
    the indices are applied to cloud rows as-is.  ``choice=0``: multinomial
    with replacement; ``choice=1``: top-K of the heat."""
    heat_ft_flat = jnp.swapaxes(heat_tf, -1, -2).reshape(
        heat_tf.shape[:-2] + (-1,)
    )
    if choice == 0:
        assert key is not None, "choice=0 (multinomial) requires a PRNG key"
        batch = heat_ft_flat.shape[:-1]
        # draws with replacement: k iid categorical samples per batch element
        idx = jax.random.categorical(
            key, jnp.log(heat_ft_flat), axis=-1, shape=(k,) + batch
        )
        return jnp.moveaxis(idx, 0, -1)
    _, idx = jax.lax.top_k(heat_ft_flat, k)
    return idx


def importance_sample_cloud(
    cloud: Array, heat_tf: Array, k: int, choice: int, key: Array | None = None
) -> Array:
    """Apply :func:`importance_indices` to a frequency-fastest cloud
    ``[..., Nt·F, 3]`` (``Code/dataset.py:286-291``)."""
    idx = importance_indices(heat_tf, k, choice, key)
    return jnp.take_along_axis(cloud, idx[..., None], axis=-2)
