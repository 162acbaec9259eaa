"""dB-threshold silence trimming (librosa ``effects.trim`` semantics, JAX).

The reference trims every clip before STFT: ``librosa.effects.trim(x,
top_db=60)`` (``Code/settransformer.py:48``).  librosa 0.8's algorithm:

  1. frame RMS of the signal, frame_length=2048, hop_length=512, centered
     (signal padded frame_length//2 each side, 'reflect');
  2. per-frame power in dB relative to the *max* frame power;
  3. non-silent = dB > -top_db;
  4. keep samples ``[first_nonsilent_frame * hop,
     min(length, (last_nonsilent_frame + 1) * hop))``.

The TPU-native version returns ``(start, trimmed_length)`` scalars instead of
slicing (XLA static shapes); downstream ops consume the window via gather.
Frame power comes from a cumulative-sum difference — O(L) on the VPU, no
explicit framing.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from pcaudio.dsp.framing import max_frames_centered, num_frames_centered

Array = jax.Array


def frame_power(
    wave: Array, length: Array, frame_length: int = 2048, hop_length: int = 512
) -> Tuple[Array, Array]:
    """Mean-square energy per centered frame.

    Returns ``(mse [T_max], frame_mask [T_max])``.  Centered framing pads the
    valid region by ``frame_length//2`` 'reflect' on each side (librosa
    ``feature.rms(center=True, pad_mode='reflect')``).
    """
    L = wave.shape[0]
    pad = frame_length // 2
    x = wave * (jnp.arange(L) < length)
    # One cumsum of x^2; every frame energy (including the reflect-padded
    # edge frames) is a difference of cumsum entries — no padded-signal
    # materialization, no full-length gather (SURVEY perf note: generic
    # gathers are the TPU killer here).
    cs = jnp.concatenate([jnp.zeros(1, wave.dtype), jnp.cumsum(x * x)])

    def E(lo, hi):
        """sum x[lo:hi]^2 with index clamping (empty when hi <= lo)."""
        lo = jnp.clip(lo, 0, L)
        hi = jnp.clip(hi, 0, L)
        return cs[hi] - cs[jnp.minimum(lo, hi)]

    t_max = max_frames_centered(L, hop_length)
    a = jnp.arange(t_max) * hop_length - pad          # frame start, unpadded coords
    b = a + frame_length
    main = E(jnp.maximum(a, 0), jnp.minimum(b, length))
    # left reflect: positions [a, 0) map to samples [1, -a]
    left = jnp.where(a < 0, E(1, -a + 1), 0.0)
    # right reflect: positions [length, b) map to samples [2len-1-b, 2len-2-d]
    d = jnp.maximum(a, length)
    right = jnp.where(b > length, E(2 * length - 1 - b, 2 * length - 1 - d), 0.0)
    mse = (main + left + right) / frame_length
    mask = jnp.arange(t_max) < num_frames_centered(length, hop_length)
    return mse, mask


def trim_bounds(
    wave: Array,
    length: Array,
    top_db: float = 60.0,
    frame_length: int = 2048,
    hop_length: int = 512,
) -> Tuple[Array, Array]:
    """Compute the non-silent window of ``wave[:length]``.

    Returns ``(start, trimmed_length)`` scalars.  Note the dB threshold is
    relative to the clip's own loudest frame, so a constant (even all-zero)
    clip is entirely "non-silent" and comes back untrimmed — librosa
    semantics.  ``(0, 0)`` only if ``length == 0``.
    """
    mse, mask = frame_power(wave, length, frame_length, hop_length)
    amin = 1.0e-10  # librosa power_to_db floor
    ref = jnp.maximum(jnp.max(jnp.where(mask, mse, 0.0)), amin)
    db = 10.0 * (jnp.log10(jnp.maximum(mse, amin)) - jnp.log10(ref))
    nonsilent = (db > -top_db) & mask
    t_max = mse.shape[0]
    idx = jnp.arange(t_max)
    any_ns = jnp.any(nonsilent)
    first = jnp.min(jnp.where(nonsilent, idx, t_max))
    last = jnp.max(jnp.where(nonsilent, idx, -1))
    start = jnp.where(any_ns, first * hop_length, 0)
    end = jnp.where(any_ns, jnp.minimum(length, (last + 1) * hop_length), 0)
    return start, end - start


def trim_to_buffer(wave: Array, start: Array, trimmed_length: Array) -> Array:
    """Materialize the trimmed window at the front of a same-size buffer
    (zeros beyond ``trimmed_length``), for ops that want offset-free input."""
    L = wave.shape[0]
    padded = jnp.concatenate([wave, jnp.zeros_like(wave)])
    out = jax.lax.dynamic_slice(padded, (start,), (L,))
    return out * (jnp.arange(L) < trimmed_length)


def trim(
    wave: Array,
    length: Array,
    top_db: float = 60.0,
    frame_length: int = 2048,
    hop_length: int = 512,
) -> Tuple[Array, Array]:
    """One-call trim: returns ``(trimmed_wave [L], trimmed_length)`` with the
    kept window moved to the buffer front."""
    start, tlen = trim_bounds(wave, length, top_db, frame_length, hop_length)
    return trim_to_buffer(wave, start, tlen), tlen
