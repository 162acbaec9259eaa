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
    mdiv = frame_length // hop_length
    assert frame_length % hop_length == 0 and pad % hop_length == 0, (
        "frame_power fast path requires hop | frame_length (librosa defaults "
        "2048/512 and every reference config satisfy this)"
    )
    x = wave * (jnp.arange(L) < length)
    t_max = max_frames_centered(L, hop_length)

    # Frame t spans unpadded samples [t·hop − pad, t·hop − pad + frame_len) —
    # exactly mdiv consecutive hop-sized blocks.  Block energies need ONE
    # pass over the wave; the frame main term is a shift-add of mdiv blocks
    # (a full-length cumsum costs log-depth passes — measured the featurize
    # hog on v5e).  Blocks beyond `length` contribute zero because x is
    # zeroed there, so no clamping is needed.
    nb = t_max + mdiv  # enough blocks to cover every frame's window
    xb = jnp.pad(x, (0, max(0, nb * hop_length - L)))[: nb * hop_length]
    eb = jnp.sum((xb * xb).reshape(nb, hop_length), axis=-1)  # [nb]
    off = pad // hop_length
    t = jnp.arange(t_max)
    main = jnp.zeros(t_max, wave.dtype)
    for i in range(-off, mdiv - off):
        idx = t + i
        main = main + jnp.where((idx >= 0) & (idx < nb), eb[jnp.clip(idx, 0, nb - 1)], 0.0)

    a = t * hop_length - pad
    b = a + frame_length

    # left reflect: positions [a, 0) mirror to samples [1, −a] — only the
    # first `off` frames; each is a block-prefix sum shifted by one sample.
    x0sq = x[0] * x[0]
    lvals = []
    for j in range(1, off + 1):  # frame t = off - j has −a = j·hop
        span = jnp.sum(eb[:j])  # Σ x[0 : j·hop]^2
        lvals.append(span - x0sq + x[jnp.minimum(j * hop_length, L - 1)] ** 2
                     * (j * hop_length < length))
    left = jnp.zeros(t_max, wave.dtype)
    for j in range(1, off + 1):
        left = left.at[off - j].set(jnp.where(length > 0, lvals[j - 1], 0.0))
    left = jnp.where(a < 0, left, 0.0)

    # right reflect: positions [length, b) mirror to a window ENDING at
    # length−2 of size (b − length); resolve with a small local cumsum over
    # the last `frame_length + hop` samples.
    tail = frame_length + hop_length
    start = jnp.clip(length - tail, 0, L - tail)
    lx = jax.lax.dynamic_slice(x, (start,), (tail,))
    lc = jnp.concatenate([jnp.zeros(1, wave.dtype), jnp.cumsum(lx * lx)])
    offl = length - start  # index of `length` inside the local window
    w = jnp.clip(b - length, 0, frame_length)
    # Σ x[length−1−w : length−1)^2 = lc[offl−1] − lc[offl−1−w]
    hi = jnp.clip(offl - 1, 0, tail)
    lo = jnp.clip(offl - 1 - w, 0, tail)
    right = jnp.where((b > length) & (a < length), lc[hi] - lc[lo], 0.0)

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
