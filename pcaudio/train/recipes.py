"""The four training recipes as configs + data preparation.

The reference trains each model with a standalone script whose constants are
the configuration (``Code/settransformer.py:34-41,77-91``, ``Code/baseline.py``,
``Code/settransformertemp.py``, ``Code/baselinetemp.py``).  Here each recipe is
an :class:`ExperimentConfig` plus functions that turn padded waveform batches
into the model's training arrays — all featurization on device.
"""
from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pcaudio.core.config import (
    ARCH_3ST, ARCH_CNN, ARCH_FB, ARCH_FST, ExperimentConfig,
)
from pcaudio.dsp.featurize import (
    FeaturizeConfig, batched_temporal_chunks, featurize_batch,
)
from pcaudio.ops.cloud import frame_cloud, freq_coords, grid_cloud, time_coords
from pcaudio.train.glue import dropout_apply, pointcloud_apply
from pcaudio.train.optim import adam_l2


def fst_config() -> ExperimentConfig:
    """``Code/settransformer.py``: Nfft=2048, dh=64, heads=8, inds=64,
    bs=128, Adam(1e-3, wd=1e-3), 500 epochs."""
    return ExperimentConfig(architecture=ARCH_FST, window_size=2048,
                            dhidden=64, nheads=8, ninds=64, batch_size=128,
                            learning_rate=1e-3, weight_decay=1e-3, epochs=500,
                            numpy_seed=1, torch_seed=1)


def fb_config() -> ExperimentConfig:
    """``Code/baseline.py``: layers [1025,513,256]→10, dropout 0.5, bs=128."""
    return ExperimentConfig(architecture=ARCH_FB, window_size=2048,
                            layers=[1025, 513, 256], dropout_prob=0.5,
                            batch_size=128, learning_rate=1e-3,
                            weight_decay=1e-3, epochs=500,
                            numpy_seed=0, torch_seed=0)


def st3_config() -> ExperimentConfig:
    """``Code/settransformertemp.py``: Nfft=1024, Ntemp=10, bs=16."""
    return ExperimentConfig(architecture=ARCH_3ST, window_size=1024, Ntemp=10,
                            dhidden=64, nheads=8, ninds=64, batch_size=16,
                            learning_rate=1e-3, weight_decay=1e-3, epochs=500,
                            numpy_seed=1, torch_seed=1)


def cnn_temp_config() -> ExperimentConfig:
    """``Code/baselinetemp.py``: CNN(Nt=10, Nf=512, [512,256,100]),
    Adam(1e-4, wd=1e-3), bs=128."""
    return ExperimentConfig(architecture=ARCH_CNN, window_size=1024, Ntemp=10,
                            Nt=10, Nf=512, layers=[512, 256, 100],
                            dropout_prob=0.5, batch_size=128,
                            learning_rate=1e-4, weight_decay=1e-3, epochs=500,
                            numpy_seed=0, torch_seed=0)


RECIPES = {"FST": fst_config, "FB": fb_config, "3ST": st3_config,
           "CNNTemp": cnn_temp_config}


def _featurize(waves, lengths, cfg: ExperimentConfig):
    fcfg = FeaturizeConfig(fs=cfg.sampling_rate, n_fft=cfg.window_size,
                           hop_factor=cfg.hop_factor, top_db=cfg.trim_dB,
                           trim=True)
    return jax.jit(lambda w, l: featurize_batch(w, l, fcfg))(waves, lengths)


def prepare_framewise_data(
    waves, lengths, labels, cfg: ExperimentConfig, as_clouds: bool
) -> Dict[str, np.ndarray]:
    """Waveforms → framewise training arrays (all valid frames pooled over
    clips, per-frame labels — ``Code/settransformer.py:43-68``).
    ``as_clouds=True`` → FST ``points [Nf, bins, 2]``; else FB ``x [Nf, bins]``.
    """
    lm, fm = _featurize(waves, lengths, cfg)
    B, T, bins = lm.shape
    frames = np.asarray(lm.reshape(B * T, bins))
    valid = np.asarray(fm.reshape(B * T))
    flabels = np.repeat(np.asarray(labels), T)
    frames, flabels = frames[valid], flabels[valid]
    if as_clouds:
        farr = np.asarray(freq_coords(bins, cfg.sampling_rate))
        points = np.asarray(frame_cloud(jnp.asarray(frames), jnp.asarray(farr)))
        return {"points": points, "labels": flabels.astype(np.int32)}
    return {"x": frames, "labels": flabels.astype(np.int32)}


def prepare_temporal_data(
    waves, lengths, labels, cfg: ExperimentConfig, as_clouds: bool
) -> Dict[str, np.ndarray]:
    """Waveforms → temporal training arrays (full 10-frame chunks pooled over
    clips — ``Code/settransformertemp.py:50-59``).  ``as_clouds=True`` →
    3ST ``points [Nc, Ntemp·(bins-1), 3]``; else CNN ``x [Nc, Ntemp, bins-1]``.
    """
    lm, fm = _featurize(waves, lengths, cfg)
    chunks, cmask = batched_temporal_chunks(lm, fm, cfg.Ntemp)
    B, C, Nt, bins = chunks.shape
    flat = np.asarray(chunks.reshape(B * C, Nt, bins))
    valid = np.asarray(cmask.reshape(B * C))
    clabels = np.repeat(np.asarray(labels), C)
    flat, clabels = flat[valid], clabels[valid]
    if as_clouds:
        farr = freq_coords(bins, cfg.sampling_rate)
        tarr = time_coords(Nt, cfg.window_size, cfg.sampling_rate,
                           cfg.hop_factor)
        points = np.asarray(grid_cloud(jnp.asarray(flat), farr, tarr))
        return {"points": points, "labels": clabels.astype(np.int32)}
    return {"x": flat, "labels": clabels.astype(np.int32)}


def build_trainer(cfg: ExperimentConfig, dtype=None,
                  fused_attn: Optional[bool] = None) -> Tuple:
    """(model, apply_fn, optimizer) for a recipe config.

    ``fused_attn`` — route the set models' attention through the trainable
    Pallas kernels (custom-VJP fwd+bwd, ``ops/kernels/mha.py``; 22.5 →
    14.1 ms/step on the FST recipe, v5e).  Default (None): ON on TPU, OFF
    elsewhere (the kernels fall back to interpret mode off-TPU — correct
    but slow); override either way with ``PCAUDIO_FUSED_ATTN=0/1``.
    Gradient parity vs the XLA path: tests/test_fused_mha_grad.py; recipe
    convergence agreement: tests/test_train.py.
    """
    if fused_attn is None:
        env = os.environ.get("PCAUDIO_FUSED_ATTN")
        if env is not None:
            fused_attn = env == "1"
        else:
            fused_attn = jax.default_backend() == "tpu"
    model = cfg.build_model(dtype=dtype, fused_attn=fused_attn)
    if cfg.architecture in (ARCH_FST, ARCH_3ST):
        apply_fn = pointcloud_apply(model)
    else:
        apply_fn = dropout_apply(model)
    optimizer = adam_l2(cfg.learning_rate, weight_decay=cfg.weight_decay)
    return model, apply_fn, optimizer
