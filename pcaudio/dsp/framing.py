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
    valid (anything beyond is ignored).  Returns a fixed-size ``[L + 2*pad]``
    buffer whose first ``length + 2*pad`` samples are valid.  Equivalent (over
    the valid region) to ``np.pad(x[:length], pad, mode='reflect')``, the
    librosa STFT ``center=True`` convention.

    TPU note: built from flips/concat + one ``pad``-sized dynamic-slice write
    for the right edge — no full-length gather (generic gathers of 200k+
    elements are catastrophically slow on TPU; measured 100x on v5e).
    """
    L = x.shape[0]
    x = x * (jnp.arange(L) < length)  # zero the invalid tail
    left = jnp.flip(x[1: pad + 1])  # valid region starts at 0 → static reflect
    body = jnp.concatenate([left, x, jnp.zeros((2 * pad,), x.dtype)])
    # right reflect: samples x[length-2] ... x[length-1-pad] written at
    # position pad + length.  Gather a (pad+1)-window ending at `length`,
    # flip it, drop the edge sample.
    start = jnp.clip(length - (pad + 1), 0, L - (pad + 1))
    win = jax.lax.dynamic_slice(x, (start,), (pad + 1,))
    right = jnp.flip(win)[1:]
    out = jax.lax.dynamic_update_slice(body, right, (pad + length,))
    return out[: L + 2 * pad]


def frame(x: Array, frame_length: int, hop_length: int, num_frames: int) -> Array:
    """Extract ``num_frames`` frames of ``frame_length`` at stride
    ``hop_length`` from a 1-D buffer → ``[num_frames, frame_length]``.

    When ``hop_length`` divides ``frame_length`` (all reference configs:
    hop = n_fft/2, and trim's 2048/512) this is pure reshape+slice+concat —
    no gather.  Falls back to a gather otherwise.
    """
    if frame_length % hop_length == 0:
        m = frame_length // hop_length
        rows = num_frames + m - 1
        need = rows * hop_length
        if need > x.shape[0]:
            x = jnp.pad(x, (0, need - x.shape[0]))
        a = x[:need].reshape(rows, hop_length)
        return jnp.concatenate(
            [a[i: i + num_frames] for i in range(m)], axis=-1
        )
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
