"""End-to-end featurization: trim → (resample) → STFT → log-magnitude.

Replaces the copy-pasted host loop the reference inlines in all nine
train/eval scripts (canonical form ``Code/settransformer.py:45-52``; temporal
variant ``Code/settransformertemp.py:50-59``) with one jitted, batched,
fixed-shape pipeline.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from pcaudio.dsp.resample import resample, resample_length
from pcaudio.dsp.stft import stft_logmag
from pcaudio.dsp.trim import trim

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class FeaturizeConfig:
    """STFT featurizer configuration (reference constants at
    ``Code/settransformer.py:34-41``; eval sweeps override ``fs``/``n_fft``/
    ``win_length`` per ``Code/pceval.py:55-76``)."""

    fs: int = 44100                 # sampling rate of the incoming buffers
    target_fs: Optional[int] = None  # resample to this rate first (expt 1)
    n_fft: int = 2048
    hop_factor: float = 0.5
    win_length: Optional[int] = None  # defaults to n_fft
    top_db: float = 60.0
    trim: bool = True
    log_floor: float = 1.0e-8
    hop_length_override: Optional[int] = None  # eval sweeps hop on win_length
    mag_norm: Optional[float] = None           # eval sweeps divide by win_length
    # "highest" = f32-accurate DFT matmul (parity/eval); "default" = fast
    # bf16-pass matmul (serving; ~3x on the STFT, |err| ~4e-3 on log-mags)
    precision: str = "highest"
    # "bfloat16" halves every downstream pass over the spectrograms (serving;
    # the set models compute in bf16 anyway).  "float32" for eval parity.
    out_dtype: str = "float32"

    @property
    def hop_length(self) -> int:
        if self.hop_length_override is not None:
            return self.hop_length_override
        return int(self.n_fft * self.hop_factor)

    @property
    def num_bins(self) -> int:
        return self.n_fft // 2 + 1


def featurize_clip(
    wave: Array, length: Array, cfg: FeaturizeConfig
) -> Tuple[Array, Array]:
    """``[L]`` waveform buffer → ``(logmag [T_max, F], frame_mask [T_max])``.

    Pipeline order matches the reference: trim at the original rate, then
    resample (eval only, ``Code/pceval.py:72-76``), then STFT.
    """
    if cfg.trim:
        wave, length = trim(wave, length, top_db=cfg.top_db)
    if cfg.target_fs is not None and cfg.target_fs != cfg.fs:
        wave, length = resample(wave, length, cfg.fs, cfg.target_fs)
    return stft_logmag(
        wave,
        length,
        n_fft=cfg.n_fft,
        hop_length=cfg.hop_length,
        win_length=cfg.win_length,
        log_floor=cfg.log_floor,
        mag_norm=cfg.mag_norm,
        precision=(jax.lax.Precision.HIGHEST if cfg.precision == "highest"
                   else jax.lax.Precision.DEFAULT),
        out_dtype=jnp.bfloat16 if cfg.out_dtype == "bfloat16" else jnp.float32,
    )


def featurize_batch(
    waves: Array, lengths: Array, cfg: FeaturizeConfig
) -> Tuple[Array, Array]:
    """vmapped :func:`featurize_clip`: ``[B, L] → ([B, T_max, F], [B, T_max])``."""
    return jax.vmap(partial(featurize_clip, cfg=cfg))(waves, lengths)


def temporal_chunks(
    logmag: Array, frame_mask: Array, num_frames: int
) -> Tuple[Array, Array]:
    """Split a spectrogram into ``num_frames``-frame patches, reference
    temporal pipeline (``Code/settransformertemp.py:52-59``): the Nyquist bin
    is dropped and the frame remainder is discarded.

    Args:
      logmag: ``[T_max, F]`` frames-major spectrogram.
      frame_mask: ``[T_max]`` frame validity.
      num_frames: patch length ``Ntemp`` (10 in the reference).

    Returns ``(chunks [C_max, num_frames, F-1], chunk_mask [C_max])`` where a
    chunk is valid iff *all* its frames are valid.
    """
    t_max, f = logmag.shape
    c_max = t_max // num_frames
    x = logmag[: c_max * num_frames, : f - 1]
    chunks = x.reshape(c_max, num_frames, f - 1)
    n_valid = jnp.sum(frame_mask.astype(jnp.int32))
    chunk_mask = (jnp.arange(c_max) + 1) * num_frames <= n_valid
    return chunks, chunk_mask


def batched_temporal_chunks(
    logmag: Array, frame_mask: Array, num_frames: int
) -> Tuple[Array, Array]:
    """vmapped :func:`temporal_chunks` over ``[B, T_max, F]``."""
    return jax.vmap(partial(temporal_chunks, num_frames=num_frames))(
        logmag, frame_mask
    )


def featurized_max_frames(buffer_len: int, cfg: FeaturizeConfig) -> int:
    """Static ``T_max`` for a given input buffer length under ``cfg``."""
    L = buffer_len
    if cfg.target_fs is not None and cfg.target_fs != cfg.fs:
        L = resample_length(L, cfg.fs, cfg.target_fs)
    return 1 + L // cfg.hop_length
