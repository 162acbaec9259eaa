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

from pcaudio.dsp.framing import max_frames_centered, num_frames_centered, reflect_index

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
    # energy of the reflect-padded signal via cumsum difference
    j = jnp.arange(L + 2 * pad) - pad
    padded = wave[reflect_index(j, length)]
    padded = padded * (j < length + pad)  # zero anything beyond the pad region
    cs = jnp.concatenate([jnp.zeros(1, wave.dtype), jnp.cumsum(padded * padded)])
    t_max = max_frames_centered(L, hop_length)
    starts = jnp.arange(t_max) * hop_length
    e = cs[jnp.minimum(starts + frame_length, L + 2 * pad)] - cs[jnp.minimum(starts, L + 2 * pad)]
    mse = e / frame_length
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
    idx = jnp.clip(jnp.arange(L) + start, 0, L - 1)
    out = wave[idx]
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
