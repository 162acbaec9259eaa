"""Spectrogram-grid → point-cloud construction (batched, device-side).

The reference builds clouds one sample at a time on the host in torch
``Dataset.__getitem__`` (``Code/dataset.py:50-54`` framewise,
``Code/dataset.py:161-166`` temporal) — a per-item CPU hot loop SURVEY.md §3.1
flags as a real bottleneck.  Here cloud construction is a batched, jittable
array op.

Coordinate conventions (exactly the reference's):
  * framewise: ``farr = linspace(0, fs/2, n_fft//2 + 1) / fs``
    (``Code/settransformer.py:40``) — note the ``+1``: Nyquist kept;
  * temporal:  ``farr = linspace(0, fs/2, n_fft//2) / fs`` (Nyquist row
    dropped) and ``tarr = linspace(0, (hop_factor·n_fft/fs)·Nt, Nt)``
    (``Code/settransformertemp.py:40-41``);
  * eval sweeps recompute ``farr`` from the *current* bin count and rate
    (``Code/pceval.py:82``).
  * temporal cloud row order: frequency fastest — row ``i`` is
    ``(f = i % F, t = i // F)`` (``Code/dataset.py:161-166``).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def freq_coords(num_bins: int, fs: int, dtype=jnp.float32) -> Array:
    """Normalized frequency coordinates ``linspace(0, fs/2, num_bins)/fs``."""
    return jnp.linspace(0.0, fs / 2.0, num_bins, dtype=dtype) / fs


def time_coords(
    num_frames: int, n_fft: int, fs: int, hop_factor: float = 0.5, dtype=jnp.float32
) -> Array:
    """Temporal coordinates ``linspace(0, (hop_factor·n_fft/fs)·Nt, Nt)``."""
    end = (hop_factor * n_fft / fs) * num_frames
    return jnp.linspace(0.0, end, num_frames, dtype=dtype)


def frame_cloud(frames: Array, farr: Array) -> Array:
    """Framewise 2-D clouds: ``[..., F]`` log-mag frames → ``[..., F, 2]``
    points ``(f_norm, log_mag)`` (``Code/dataset.py:50-54``)."""
    shape = frames.shape
    f = jnp.broadcast_to(farr, shape)
    return jnp.stack([f, frames], axis=-1)


def grid_cloud(grid_tf: Array, farr: Array, tarr: Array) -> Array:
    """Temporal 3-D clouds: ``[..., Nt, F]`` log-mag grids →
    ``[..., Nt·F, 3]`` points ``(f_norm, t_sec, log_mag)`` in the reference's
    frequency-fastest row order (``Code/dataset.py:161-166``)."""
    nt, f = grid_tf.shape[-2], grid_tf.shape[-1]
    batch = grid_tf.shape[:-2]
    fcol = jnp.broadcast_to(farr[None, :], grid_tf.shape)
    tcol = jnp.broadcast_to(tarr[:, None], grid_tf.shape)
    pts = jnp.stack([fcol, tcol, grid_tf], axis=-1)
    return pts.reshape(batch + (nt * f, 3))
