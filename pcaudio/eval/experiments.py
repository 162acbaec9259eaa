"""The experiment harness: robustness sweeps and subsampling curves.

TPU-native re-design of the five reference eval scripts —
``Code/pceval.py`` (FST), ``Code/baseline_eval.py`` (FB),
``Code/pc_temp3d_eval.py`` (3ST), ``Code/baseline_temp_eval.py`` (CNN_temp),
``Code/rebut_expts.py`` (importance sampling) — as one parameterized module.
The emitted dicts serialize to **exactly** the ``Code/paper_plots/*.json``
schemas (consumed by the plot layer):

  expt1:  ``{"data": {Fs: [acc per N]}, "list_Fs": [...], "list_N": [...]}``
  expt2:  ``{"data": {K: [mean, var]}, "list_K": [...]}``
  rebut:  ``{"data": {winF: {K: [mean, var]}}, "list_K": [...]}``

Faithful featurization rules per script:
  * FST expt1 (``pceval.py:76``): ``n_fft = 2^ceil(log2 N)``, win N, hop
    ``N·hf``, magnitude /N;
  * FB expt1 (``baseline_eval.py:76``): ``n_fft`` FIXED at the training
    Nfft (input dim can't change), win N, hop ``N·hf``, magnitude /Nfft_og,
    and no N > Nfft entries (``baseline_eval.py:54``);
  * temporal variants drop the Nyquist row and chunk into Ntemp frames
    (``pc_temp3d_eval.py:75-78``);
  * rand-K averaged over Nruns (10 for expt2, ``pceval.py:114``; 1 for the
    rebuttal, ``rebut_expts.py:58``), top-K once.

Deviation (documented): the reference drops the shuffled DataLoader's trailing
partial batch when counting accuracy — a nondeterministic ~1% subsample; here
accuracy is over ALL valid frames/chunks.
"""
from __future__ import annotations

import math
import os
from typing import Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from pcaudio.dsp.featurize import FeaturizeConfig, batched_temporal_chunks, featurize_batch
from pcaudio.ops.cloud import frame_cloud, freq_coords, grid_cloud, time_coords
from pcaudio.ops.subsample import (
    grid_top_k_replace,
    importance_heatmap,
    importance_sample_cloud,
    rand_k_points,
    rand_k_replace,
    top_k_points,
    top_k_replace,
)

Array = jax.Array

# ONE process-wide jitted featurizer, keyed by the frozen FeaturizeConfig —
# a sweep point's (n_fft, win, hop, fs) combination compiles exactly once per
# process, shared across models and repeated experiment runs (a per-sweep-
# point ``jax.jit(lambda ...)`` would recompile every iteration).
_jit_featurize = jax.jit(featurize_batch, static_argnames=("cfg",))

# Device-memory bound for classifier calls: the reference evaluates in
# DataLoader batches (bs=8, ``Code/pceval.py:85``); a single call over the
# whole test set materializes attention intermediates for every frame/chunk
# at once (e.g. [Nb, h, m, N] for ISAB) and crashes the TPU compile at real
# test-set sizes.  Frames (1025-pt clouds / dense rows) and temporal chunks
# (5120-pt clouds) get separate budgets.
_MB_FRAMES = int(os.environ.get("PCAUDIO_EVAL_MICROBATCH_FRAMES", "1024"))
_MB_CHUNKS = int(os.environ.get("PCAUDIO_EVAL_MICROBATCH_CHUNKS", "256"))


def _microbatched(fn, split_argnums: Sequence[int], bs: int,
                  key_argnums: Sequence[int] = ()):
    """Apply ``fn`` over fixed-size axis-0 microbatches of the args named by
    ``split_argnums`` (other args pass through), padding the last slice to
    ``bs`` so every call hits the same compiled program, and concatenating
    the outputs (sliced back to true length).

    PRNG-key args named by ``key_argnums`` are folded with the microbatch
    index (``jax.random.fold_in``) so random subsampling draws are
    independent across microbatches — reusing one key would repeat the same
    per-row selection pattern every ``bs`` rows, correlating results that
    the reference methodology draws i.i.d. over the whole test set."""
    split = tuple(split_argnums)
    keys = tuple(key_argnums)

    def wrapped(*args):
        n = args[split[0]].shape[0]
        if n <= bs:
            return fn(*args)
        outs = []
        for mb, i in enumerate(range(0, n, bs)):
            m = min(bs, n - i)
            sl = list(args)
            for j in split:
                x = args[j][i: i + m]
                if m < bs:
                    x = jnp.pad(x, [(0, bs - m)] + [(0, 0)] * (x.ndim - 1))
                sl[j] = x
            for j in keys:
                sl[j] = jax.random.fold_in(args[j], mb)
            outs.append(fn(*sl)[:m])
        return jnp.concatenate(outs, axis=0)

    return wrapped


def default_list_N(Nfft: int, include_larger: bool = True) -> List[int]:
    """The reference window sweep (``Code/pceval.py:56``; set models include
    windows larger than the training window, grid baselines cannot —
    ``Code/baseline_eval.py:54``)."""
    larger = [2 * Nfft, int(1.5 * Nfft), int(1.25 * Nfft), int(1.05 * Nfft)]
    base = [Nfft, int(0.95 * Nfft), int(0.9 * Nfft), int(0.8 * Nfft),
            int(0.7 * Nfft), int(0.6 * Nfft), int(0.5 * Nfft),
            int(0.25 * Nfft), int(0.1 * Nfft)]
    return (larger if include_larger else []) + base


def default_list_Fs(fsog: int) -> List:
    """``[fsog, 32000, 0.5·fsog, 0.25·fsog]`` — float keys stay floats so the
    JSON keys match the reference exactly ("22050.0")."""
    return [fsog, 32000, 0.5 * fsog, 0.25 * fsog]


def default_list_K(n_total: int) -> List[int]:
    """``arange(1, n_total, 50)`` with the last entry snapped to ``n_total``
    (``Code/pceval.py:111-113``)."""
    ks = list(np.arange(1, n_total, 50))
    ks[-1] = n_total
    return [int(k) for k in ks]


# ---------------------------------------------------------------------------
# featurization per sweep point
# ---------------------------------------------------------------------------

def sweep_featurize_config(
    F, N: int, *, fsog: int, hf: float, tDb: float,
    fixed_nfft: Optional[int] = None,
) -> FeaturizeConfig:
    """Featurizer for one (sampling-rate, window) sweep point."""
    n_fft = fixed_nfft if fixed_nfft is not None else 2 ** int(math.ceil(math.log2(N)))
    return FeaturizeConfig(
        fs=fsog,
        target_fs=None if int(F) == fsog else int(F),
        n_fft=n_fft,
        win_length=N,
        hop_length_override=int(N * hf),
        mag_norm=float(fixed_nfft) if fixed_nfft is not None else float(N),
        top_db=tDb,
        trim=True,
    )


def _valid_frames(logmag: Array, mask: Array, labels: Array):
    """Flatten a [B, T, F] batch to valid frames + per-frame labels (the
    reference concatenates frames over clips, ``Code/pceval.py:77-80``)."""
    B, T, F = logmag.shape
    frames = logmag.reshape(B * T, F)
    fmask = mask.reshape(B * T)
    flabels = jnp.repeat(labels, T)
    return frames, fmask, flabels


def _accuracy(logits: Array, labels: Array, valid: Array) -> float:
    ok = (jnp.argmax(logits, -1) == labels) & valid
    return float(jnp.sum(ok) / jnp.maximum(jnp.sum(valid), 1))


# ---------------------------------------------------------------------------
# experiment 1 — (Fs, N) robustness sweeps
# ---------------------------------------------------------------------------

def framewise_expt1(
    frame_classifier: Callable[[Array, Array], Array],
    waves: Array,
    lengths: Array,
    labels: Array,
    *,
    fsog: int = 44100,
    Nfft: int = 2048,
    hf: float = 0.5,
    tDb: float = 60.0,
    fixed_nfft: bool = False,
    list_Fs: Optional[Sequence] = None,
    list_N: Optional[Sequence[int]] = None,
) -> Dict:
    """FST/FB experiment 1 (``Code/pceval.py:55-105`` /
    ``Code/baseline_eval.py:53-103``).

    ``frame_classifier(frames [Nb, bins], farr [bins]) -> logits`` — see
    :func:`make_fst_frame_classifier` / :func:`make_fb_frame_classifier`.
    ``fixed_nfft=True`` = FB featurization (n_fft pinned to the training
    window; the sweep only shrinks the analysis window).
    """
    list_Fs = list(default_list_Fs(fsog) if list_Fs is None else list_Fs)
    if list_N is None:
        list_N = default_list_N(Nfft, include_larger=not fixed_nfft)
    list_N = [int(n) for n in list_N]

    out = {"data": {F: [] for F in list_Fs}, "list_Fs": list_Fs,
           "list_N": list_N}
    jitted = _microbatched(jax.jit(frame_classifier), (0,), _MB_FRAMES)
    for F in list_Fs:
        for N in list_N:
            cfg = sweep_featurize_config(
                F, N, fsog=fsog, hf=hf, tDb=tDb,
                fixed_nfft=Nfft if fixed_nfft else None,
            )
            lm, fm = _jit_featurize(waves, lengths, cfg=cfg)
            frames, valid, flabels = _valid_frames(lm, fm, labels)
            farr = freq_coords(frames.shape[-1], int(F))
            logits = jitted(frames, farr)
            out["data"][F].append(_accuracy(logits, flabels, valid))
    return out


def temporal_expt1(
    chunk_classifier: Callable[[Array, Array, Array], Array],
    waves: Array,
    lengths: Array,
    labels: Array,
    *,
    fsog: int = 44100,
    Nfft: int = 1024,
    Ntemp: int = 10,
    hf: float = 0.5,
    tDb: float = 60.0,
    fixed_nfft: bool = False,
    list_Fs: Optional[Sequence] = None,
    list_N: Optional[Sequence[int]] = None,
) -> Dict:
    """3ST/CNN_temp experiment 1 (``Code/pc_temp3d_eval.py:56-106`` /
    ``Code/baseline_temp_eval.py:53-102``).

    ``chunk_classifier(chunks [Nb, Ntemp, bins], farr, tarr) -> logits``.
    """
    list_Fs = list(default_list_Fs(fsog) if list_Fs is None else list_Fs)
    if list_N is None:
        list_N = default_list_N(Nfft, include_larger=not fixed_nfft)
    list_N = [int(n) for n in list_N]

    out = {"data": {F: [] for F in list_Fs}, "list_Fs": list_Fs,
           "list_N": list_N}
    jitted = _microbatched(jax.jit(chunk_classifier), (0,), _MB_CHUNKS)
    for F in list_Fs:
        for N in list_N:
            cfg = sweep_featurize_config(
                F, N, fsog=fsog, hf=hf, tDb=tDb,
                fixed_nfft=Nfft if fixed_nfft else None,
            )
            lm, fm = _jit_featurize(waves, lengths, cfg=cfg)
            chunks, cmask = batched_temporal_chunks(lm, fm, Ntemp)
            B, C, Nt, bins = chunks.shape
            flat = chunks.reshape(B * C, Nt, bins)
            valid = cmask.reshape(B * C)
            clabels = jnp.repeat(labels, C)
            farr = freq_coords(bins, int(F))
            # tarr recomputed with the sweep's window and rate
            # (Code/pc_temp3d_eval.py:87)
            tarr = jnp.linspace(0.0, (hf * N / int(F)) * Nt, Nt)
            logits = jitted(flat, farr, tarr)
            out["data"][F].append(_accuracy(logits, clabels, valid))
    return out


# ---------------------------------------------------------------------------
# experiment 2 — subsampling curves
# ---------------------------------------------------------------------------

def framewise_expt2(
    frame_classifier: Callable[[Array, Array], Array],
    cloud_classifier: Callable[[Array], Array],
    waves: Array,
    lengths: Array,
    labels: Array,
    *,
    mode: str,  # "cloud" (FST, pc_randK/maxK) or "replace" (FB, zeroed grid)
    fsog: int = 44100,
    Nfft: int = 2048,
    hf: float = 0.5,
    tDb: float = 60.0,
    list_K: Optional[Sequence[int]] = None,
    nruns: int = 10,
    seed: int = 0,
):
    """FST/FB experiment 2 (``Code/pceval.py:107-192`` /
    ``Code/baseline_eval.py:105-183``).  Returns ``(randK_dict, maxK_dict)``.

    ``cloud_classifier(points [Nb, K, 2]) -> logits`` is used for mode
    "cloud"; ``frame_classifier`` for mode "replace".
    """
    list_K = default_list_K(Nfft // 2) if list_K is None else [int(k) for k in list_K]
    cfg = FeaturizeConfig(fs=fsog, n_fft=Nfft, top_db=tDb, trim=True)
    lm, fm = _jit_featurize(waves, lengths, cfg=cfg)
    frames, valid, flabels = _valid_frames(lm, fm, labels)
    farr = freq_coords(frames.shape[-1], fsog)

    rand_out = {"data": {}, "list_K": list_K}
    max_out = {"data": {}, "list_K": list_K}
    key = jax.random.key(seed)

    if mode == "cloud":
        clouds = frame_cloud(frames, farr)
        # selection + classification fused into ONE compiled program per K
        # (static arg) — no materialized intermediate clouds, no per-call
        # retrace across the nruns loop.
        jrand = _microbatched(
            jax.jit(lambda k2, c, K: cloud_classifier(rand_k_points(k2, c, K)),
                    static_argnums=2), (1,), _MB_FRAMES, key_argnums=(0,))
        jmax = _microbatched(
            jax.jit(lambda c, K: cloud_classifier(top_k_points(c, K)),
                    static_argnums=1), (0,), _MB_FRAMES)
        for K in list_K:
            accs = []
            for r in range(nruns):
                key, sub = jax.random.split(key)
                accs.append(_accuracy(jrand(sub, clouds, K), flabels, valid))
            rand_out["data"][K] = [float(np.mean(accs)), float(np.var(accs))]
            max_out["data"][K] = [_accuracy(jmax(clouds, K), flabels, valid), 0]
    elif mode == "replace":
        jrand = _microbatched(jax.jit(
            lambda k2, fr, fa, K: frame_classifier(rand_k_replace(k2, fr, K), fa),
            static_argnums=3), (1,), _MB_FRAMES, key_argnums=(0,))
        jmax = _microbatched(jax.jit(
            lambda fr, fa, K: frame_classifier(top_k_replace(fr, K), fa),
            static_argnums=2), (0,), _MB_FRAMES)
        for K in list_K:
            accs = []
            for r in range(nruns):
                key, sub = jax.random.split(key)
                accs.append(_accuracy(jrand(sub, frames, farr, K),
                                      flabels, valid))
            rand_out["data"][K] = [float(np.mean(accs)), float(np.var(accs))]
            max_out["data"][K] = [_accuracy(jmax(frames, farr, K),
                                            flabels, valid), 0]
    else:
        raise ValueError(f"mode must be 'cloud' or 'replace', got {mode!r}")
    return rand_out, max_out


def _temporal_test_chunks(waves, lengths, labels, *, fsog, Nfft, Ntemp, hf, tDb):
    cfg = FeaturizeConfig(fs=fsog, n_fft=Nfft, top_db=tDb, trim=True)
    lm, fm = _jit_featurize(waves, lengths, cfg=cfg)
    chunks, cmask = batched_temporal_chunks(lm, fm, Ntemp)
    B, C, Nt, bins = chunks.shape
    flat = chunks.reshape(B * C, Nt, bins)
    valid = cmask.reshape(B * C)
    clabels = jnp.repeat(labels, C)
    farr = freq_coords(bins, fsog)
    tarr = time_coords(Ntemp, Nfft, fsog, hf)
    return flat, valid, clabels, farr, tarr


def temporal_expt2(
    cloud_classifier: Callable[[Array], Array],
    grid_classifier: Optional[Callable[[Array], Array]],
    waves: Array,
    lengths: Array,
    labels: Array,
    *,
    mode: str,  # "cloud" (3ST *KSS) or "replace" (CNN_temp zeroed grid)
    fsog: int = 44100,
    Nfft: int = 1024,
    Ntemp: int = 10,
    hf: float = 0.5,
    tDb: float = 60.0,
    list_K: Optional[Sequence[int]] = None,
    nruns: int = 10,
    seed: int = 0,
):
    """3ST/CNN_temp experiment 2 (``Code/pc_temp3d_eval.py:109-200`` /
    ``Code/baseline_temp_eval.py:104-197``)."""
    n_total = Nfft * Ntemp // 2
    list_K = default_list_K(n_total) if list_K is None else [int(k) for k in list_K]
    flat, valid, clabels, farr, tarr = _temporal_test_chunks(
        waves, lengths, labels, fsog=fsog, Nfft=Nfft, Ntemp=Ntemp, hf=hf, tDb=tDb
    )
    rand_out = {"data": {}, "list_K": list_K}
    max_out = {"data": {}, "list_K": list_K}
    key = jax.random.key(seed)

    if mode == "cloud":
        clouds = grid_cloud(flat, farr, tarr)
        jrand = _microbatched(
            jax.jit(lambda k2, c, K: cloud_classifier(rand_k_points(k2, c, K)),
                    static_argnums=2), (1,), _MB_CHUNKS, key_argnums=(0,))
        jmax = _microbatched(
            jax.jit(lambda c, K: cloud_classifier(top_k_points(c, K)),
                    static_argnums=1), (0,), _MB_CHUNKS)
        for K in list_K:
            accs = []
            for r in range(nruns):
                key, sub = jax.random.split(key)
                accs.append(_accuracy(jrand(sub, clouds, K), clabels, valid))
            rand_out["data"][K] = [float(np.mean(accs)), float(np.var(accs))]
            max_out["data"][K] = [
                _accuracy(jmax(clouds, K), clabels, valid), 0]
    elif mode == "replace":
        jrand = _microbatched(jax.jit(
            lambda k2, fl, K: grid_classifier(
                grid_top_k_replace(fl, K, flag="rand", key=k2)),
            static_argnums=2), (1,), _MB_CHUNKS, key_argnums=(0,))
        jmax = _microbatched(jax.jit(
            lambda fl, K: grid_classifier(grid_top_k_replace(fl, K, flag="max")),
            static_argnums=1), (0,), _MB_CHUNKS)
        for K in list_K:
            accs = []
            for r in range(nruns):
                key, sub = jax.random.split(key)
                accs.append(_accuracy(jrand(sub, flat, K), clabels, valid))
            rand_out["data"][K] = [float(np.mean(accs)), float(np.var(accs))]
            max_out["data"][K] = [_accuracy(jmax(flat, K), clabels, valid), 0]
    else:
        raise ValueError(f"mode must be 'cloud' or 'replace', got {mode!r}")
    return rand_out, max_out


def rebut_importance_expt(
    cloud_classifier: Callable[[Array], Array],
    waves: Array,
    lengths: Array,
    labels: Array,
    *,
    fsog: int = 44100,
    Nfft: int = 1024,
    Ntemp: int = 10,
    hf: float = 0.5,
    tDb: float = 60.0,
    list_winF: Sequence[int] = (64,),
    list_K: Optional[Sequence[int]] = None,
    nruns: int = 1,
    seed: int = 0,
):
    """Importance-sampling rebuttal experiment (``Code/rebut_expts.py:55-148``)
    on 3ST.  Returns ``(randK_dict, maxK_dict)`` with the nested
    ``{"data": {winF: {K: [mean, var]}}}`` schema."""
    n_total = Nfft * Ntemp // 2
    list_K = default_list_K(n_total) if list_K is None else [int(k) for k in list_K]
    flat, valid, clabels, farr, tarr = _temporal_test_chunks(
        waves, lengths, labels, fsog=fsog, Nfft=Nfft, Ntemp=Ntemp, hf=hf, tDb=tDb
    )
    clouds = grid_cloud(flat, farr, tarr)
    jheat = jax.jit(importance_heatmap, static_argnames=("win_f",))
    jrand = _microbatched(jax.jit(
        lambda c, h, K, k2: cloud_classifier(
            importance_sample_cloud(c, h, K, choice=0, key=k2)),
        static_argnums=2), (0, 1), _MB_CHUNKS, key_argnums=(3,))
    jmax = _microbatched(jax.jit(
        lambda c, h, K: cloud_classifier(
            importance_sample_cloud(c, h, K, choice=1)),
        static_argnums=2), (0, 1), _MB_CHUNKS)
    rand_out = {"data": {int(w): {} for w in list_winF}, "list_K": list_K}
    max_out = {"data": {int(w): {} for w in list_winF}, "list_K": list_K}
    key = jax.random.key(seed)
    for winF in list_winF:
        heat = jheat(flat, win_f=int(winF))
        for K in list_K:
            accs = []
            for r in range(nruns):
                key, sub = jax.random.split(key)
                accs.append(_accuracy(jrand(clouds, heat, K, sub),
                                      clabels, valid))
            rand_out["data"][int(winF)][K] = [float(np.mean(accs)),
                                              float(np.var(accs))]
            max_out["data"][int(winF)][K] = [
                _accuracy(jmax(clouds, heat, K), clabels, valid), 0]
    return rand_out, max_out


# ---------------------------------------------------------------------------
# model → classifier adapters
# ---------------------------------------------------------------------------

def make_fst_frame_classifier(model, params):
    """frames [Nb, bins] + farr → FST logits (``ESC_pc`` semantics,
    ``Code/dataset.py:50-54``)."""
    def fn(frames, farr):
        return model.apply(params, frame_cloud(frames, farr))
    return fn


def make_fb_frame_classifier(model, params):
    """frames [Nb, bins] → FB logits (``ESC_baseline``, ``Code/dataset.py:27``);
    farr unused (kept for the common expt1 signature)."""
    def fn(frames, farr=None):
        return model.apply(params, frames)
    return fn


def make_3st_chunk_classifier(model, params):
    """chunks [Nb, Ntemp, bins] + coords → 3ST logits (``ESC_pc_temp``)."""
    def fn(chunks, farr, tarr):
        return model.apply(params, grid_cloud(chunks, farr, tarr))
    return fn


def make_cnn_chunk_classifier(model, params):
    """chunks [Nb, Ntemp, bins] → CNN_temp logits (``ESC_baseline_temporal``)."""
    def fn(chunks, farr=None, tarr=None):
        return model.apply(params, chunks)
    return fn


def make_cloud_classifier(model, params):
    """points [Nb, K, d] → logits (subsampling experiments)."""
    def fn(points):
        return model.apply(params, points)
    return fn
