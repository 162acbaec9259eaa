"""Polyphase kaiser-windowed-sinc resampling (librosa/resampy-compatible, JAX).

The eval harness re-featurizes audio at lower rates with
``librosa.resample(x, fs_og, fs, res_type='kaiser_fast', scale=True)``
(``Code/pceval.py:75``).  resampy's ``kaiser_fast`` is a windowed-sinc
interpolation filter: 16 zero-crossings, rolloff 0.85, Kaiser β≈8.5555,
evaluated at fractional offsets (resampy tabulates + linearly interpolates;
here the continuous filter is evaluated exactly — same design, slightly
cleaner response).  librosa's ``scale=True`` divides by ``sqrt(ratio)`` to
approximately preserve total energy.

TPU-native design: for each output sample a fixed-width gather of input
samples is weighted by analytically-evaluated taps — one ``[n_out, 2W+1]``
gather + row-wise dot, fully vectorized on the VPU, vmappable over a batch.
Exact resampy/librosa parity is numerical-tolerance only (SURVEY.md §7 hard
part 1); parity tests bound the error on band-limited signals.
"""
from __future__ import annotations

import math
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array

# resampy filter families (public parameters).
KAISER_FAST = dict(num_zeros=16, beta=8.555504641634386, rolloff=0.85)
KAISER_BEST = dict(num_zeros=64, beta=14.769656459379492, rolloff=0.9475937167399596)


def _kaiser(u: Array, half_width: float, beta: float) -> Array:
    """Continuous Kaiser window on ``[-half_width, half_width]``."""
    x = u / half_width
    inside = jnp.abs(x) <= 1.0
    x = jnp.where(inside, x, 1.0)
    w = jax.scipy.special.i0(beta * jnp.sqrt(1.0 - x * x)) / jax.scipy.special.i0(
        jnp.asarray(beta)
    )
    return jnp.where(inside, w, 0.0)


def resample_length(n: int, orig_sr: int, target_sr: int) -> int:
    """Output length, librosa convention: ``ceil(n * target/orig)``."""
    return int(-(-n * target_sr // orig_sr))


def resample(
    wave: Array,
    length: Array,
    orig_sr: int,
    target_sr: int,
    num_zeros: int = 16,
    beta: float = KAISER_FAST["beta"],
    rolloff: float = 0.85,
    scale: bool = True,
) -> Tuple[Array, Array]:
    """Resample ``wave[:length]`` from ``orig_sr`` to ``target_sr``.

    Args:
      wave: ``[L]`` fixed buffer, first ``length`` samples valid.
      length: scalar valid-sample count (dynamic).
      orig_sr/target_sr: static python ints (part of the jit signature).

    Returns ``(out [L_out_max], out_length)`` with
    ``L_out_max = resample_length(L, orig_sr, target_sr)`` (static) and
    ``out_length = ceil(length * ratio)`` (dynamic); samples beyond
    ``out_length`` are zero.
    """
    if orig_sr == target_sr:
        return wave, length
    L = wave.shape[0]
    ratio = target_sr / orig_sr
    scale_f = min(1.0, ratio)  # filter stretch when downsampling
    W = int(-(-num_zeros // scale_f))  # ceil: filter half-width in input samples

    n_out = resample_length(L, orig_sr, target_sr)
    # exact rational output times t_i = i·p/q (input-sample units) with the
    # reduced fraction p/q = orig/target — keeps the integer numerators within
    # int32 for multi-second buffers (i·orig_sr would overflow).
    g = math.gcd(orig_sr, target_sr)
    p, q = orig_sr // g, target_sr // g
    if (n_out + 1) * p >= 2**31:
        raise ValueError(
            f"resample {orig_sr}->{target_sr} over {L} samples exceeds int32 "
            "index arithmetic; use rates with a larger common divisor"
        )
    i = jnp.arange(n_out)
    t_num = i * p  # t = t_num / q
    n0 = t_num // q
    frac = (t_num - n0 * q).astype(jnp.float32) / q

    offs = jnp.arange(-W, W + 1)
    idx = n0[:, None] + offs[None, :]
    valid = (idx >= 0) & (idx < length)
    xg = jnp.where(valid, wave[jnp.clip(idx, 0, L - 1)], 0.0)

    u = scale_f * (frac[:, None] - offs[None, :].astype(jnp.float32))
    # prototype lowpass: rolloff·sinc(rolloff·u)·kaiser(u); amplitude is
    # additionally scaled by the stretch factor when downsampling (resampy).
    amp = scale_f if scale_f < 1.0 else 1.0
    taps = amp * rolloff * jnp.sinc(rolloff * u) * _kaiser(u, float(num_zeros), beta)
    out = jnp.einsum("ow,ow->o", xg, taps.astype(wave.dtype))

    out_length = (length * q + p - 1) // p  # ceil(length·target/orig), reduced
    out = out * (i < out_length)
    if scale:
        out = out / jnp.sqrt(jnp.asarray(ratio, out.dtype))  # librosa scale=True
    return out, out_length


def batched_resample(
    waves: Array, lengths: Array, orig_sr: int, target_sr: int, **kw
) -> Tuple[Array, Array]:
    """vmapped :func:`resample` over ``[B, L]``."""
    fn = partial(resample, orig_sr=orig_sr, target_sr=target_sr, **kw)
    return jax.vmap(fn)(waves, lengths)
