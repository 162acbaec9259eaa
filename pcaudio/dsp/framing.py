"""Static-shape signal framing with dynamic valid lengths.

The reference does all featurization on the host with librosa/numpy, one
ragged clip at a time (``Code/settransformer.py:43-68``).  The TPU-native
pipeline instead works on fixed-length zero-padded waveform buffers with a
per-clip ``length`` scalar: padding conventions (librosa's centered 'reflect'
pad) become gather index maps, and "how many frames does this clip have"
becomes a frame-validity mask.  Everything here is jit/vmap-friendly.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def reflect_index(j: Array, n: Array) -> Array:
    """Index map for numpy-style 'reflect' padding (edge not repeated).

    Maps a possibly-out-of-range index ``j`` into ``[0, n)``:
    ``j<0 → -j``, ``j>=n → 2n-2-j`` (single reflection — valid while the pad
    width stays below ``n-1``, always true for audio clips), clamped for
    safety when ``n`` is tiny.
    """
    j = jnp.where(j < 0, -j, j)
    j = jnp.where(j >= n, 2 * n - 2 - j, j)
    return jnp.clip(j, 0, jnp.maximum(n - 1, 0))


def pad_center_reflect(x: Array, length: Array, pad: int) -> Array:
    """Center-pad ``x[:length]`` by ``pad`` samples of 'reflect' on each side.

    ``x`` is a fixed-size ``[L]`` buffer whose first ``length`` samples are
    valid.  Returns a fixed-size ``[L + 2*pad]`` buffer whose first
    ``length + 2*pad`` samples are valid.  Equivalent (over the valid region)
    to ``np.pad(x[:length], pad, mode='reflect')``, the librosa STFT
    ``center=True`` convention.
    """
    L = x.shape[0]
    j = jnp.arange(L + 2 * pad) - pad
    src = reflect_index(j, length)
    return x[src]


def frame(x: Array, frame_length: int, hop_length: int, num_frames: int) -> Array:
    """Extract ``num_frames`` frames of ``frame_length`` at stride
    ``hop_length`` from a 1-D buffer → ``[num_frames, frame_length]``.

    Purely static gather; callers mask frames beyond the clip's valid count.
    """
    starts = jnp.arange(num_frames) * hop_length
    idx = starts[:, None] + jnp.arange(frame_length)[None, :]
    idx = jnp.clip(idx, 0, x.shape[0] - 1)
    return x[idx]


def num_frames_centered(length: Array, hop_length: int) -> Array:
    """Frame count of a centered STFT: ``1 + length // hop_length``
    (librosa ``center=True``: padded length ``length + n_fft`` framed by
    ``n_fft``-long windows → ``1 + (length + n_fft - n_fft)//hop``)."""
    return 1 + length // hop_length


def max_frames_centered(buffer_length: int, hop_length: int) -> int:
    """Static frame-budget for a ``buffer_length``-sample buffer."""
    return 1 + buffer_length // hop_length
