"""Fused end-to-end inference pipelines: waveform → point cloud → class.

This is the serving path the reference never had (its eval scripts re-featurize
on the host with librosa and classify frame tensors one DataLoader batch at a
time).  Here the whole thing is one jitted program: trim → STFT → log-mag →
temporal chunking → masked top-K extraction → Set Transformer → clip logits.

Reference semantics preserved: 3ST temporal pipeline (Nfft=1024, Nyquist row
dropped, 10-frame chunks, remainder discarded — ``Code/settransformertemp.py:
35-59``), ``ESC_pc_temp_maxKSS``-style top-K clouds (``Code/dataset.py:169-202``),
chunk-level logits; clip-level classification averages logits over valid
chunks (the reference reports chunk-level accuracy; see ``clip_logits``).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from pcaudio.core.types import PointCloud
from pcaudio.dsp.featurize import FeaturizeConfig, featurize_batch, batched_temporal_chunks
from pcaudio.ops.cloud import freq_coords, grid_cloud, time_coords

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class TemporalPipelineConfig:
    """3ST-style pipeline config (``Code/settransformertemp.py:35-42``)."""

    fs: int = 44100
    target_fs: Optional[int] = None
    n_fft: int = 1024
    hop_factor: float = 0.5
    win_length: Optional[int] = None
    num_frames: int = 10          # Ntemp chunk length
    top_k: Optional[int] = None   # None → full 5120-point clouds
    trim: bool = True
    top_db: float = 60.0
    stft_precision: str = "highest"  # "default" for serving speed
    compute_dtype: str = "float32"   # "bfloat16" halves serving memory traffic
    # "exact": reference top-K semantics (two-stage per-frame decomposition
    # when K ≤ bins — provably identical set, ~30%% faster than a flat sort);
    # "approx": jax.lax.approx_max_k on bf16 keys (~2.7x faster, recall ≥0.99)
    extraction: str = "exact"
    # "fused": the Pallas wave→|STFT|² kernel (one HBM read, selection on
    # squared magnitudes, log only on the K winners); "xla": the jit chain.
    # Fused requires top_k set, no resampling, and the standard hop.
    featurize: str = "xla"
    # approx-mode recall target.  At K=128-of-5120 the XLA PartialReduce
    # cannot reduce at 0.99 (needs ~K/(1−recall) > 5120 candidates) and
    # degenerates to a full exact top-k (68 ms at serving batch); 0.95
    # reduces (28 ms); 0.9 reduces harder (10.6 ms) and, measured on the
    # shipped 3ST checkpoint over synthetic tone mixtures, produces
    # BIT-IDENTICAL classifications to 0.95/0.85 (same internal reduction
    # plan) — while 0.8 collapses.  The paper's own subsampling results
    # (``Code/paper_plots/*_expt2.json``) show accuracy is insensitive to
    # far larger selection perturbations than this recall miss.
    approx_recall: float = 0.9
    # exact-mode selection engine for the fused featurize path.  None (auto):
    # the sort-free exact Pallas kernel (ops/kernels/select.py) on TPU, the
    # two-stage XLA top-k elsewhere.  True/False force either (True off-TPU
    # runs the kernel in interpret mode — tests only).  The kernel selects
    # the identical set to ``lax.top_k`` (take-first-on-ties), emitted in
    # ascending flat-index order; every consumer is permutation-invariant.
    exact_kernel: Optional[bool] = None
    # fused-ST sample block per grid step (None → the kernel default, 16).
    # Default 32: measured −7 ms on the mask-free ST stage at the serving
    # shape (61.2 → 54.2 ms at 44k chunks, scripts/probe_e2e_composition.py)
    # and −7 ms e2e (98.0 → 91.0, bench A/B round 5); config-keyed so it
    # participates in the trace cache.
    st_block_b: Optional[int] = 32

    def _use_exact_kernel(self) -> bool:
        if self.exact_kernel is not None:
            return self.exact_kernel
        return jax.default_backend() == "tpu"

    def featurize_config(self) -> FeaturizeConfig:
        return FeaturizeConfig(
            fs=self.fs,
            target_fs=self.target_fs,
            n_fft=self.n_fft,
            hop_factor=self.hop_factor,
            win_length=self.win_length,
            top_db=self.top_db,
            trim=self.trim,
            precision=self.stft_precision,
            out_dtype=self.compute_dtype,
        )


def extract_chunk_clouds(
    waves: Array, lengths: Array, cfg: TemporalPipelineConfig
) -> Tuple[PointCloud, Array]:
    """waveforms → per-chunk temporal point clouds.

    Returns ``(cloud, chunk_mask [B, C])`` where ``cloud`` is a
    :class:`~pcaudio.core.types.PointCloud` over the flattened chunk batch:
    ``points [B·C, K, 3]``, ``mask [B·C, K]``, ``K = cfg.top_k or
    Nt·(n_fft//2)`` — the shape every set-model consumer wants.

    ``waves`` may be raw PCM int16 (the serving H2D-halving staging
    format): the ``/32768`` conversion librosa.load applies on the host
    happens here on device instead — one cheap XLA convert, identical
    values for 16-bit sources.
    """
    if waves.dtype == jnp.int16:
        waves = waves.astype(jnp.float32) * (1.0 / 32768.0)
    if cfg.featurize == "fused":
        return _extract_fused(waves, lengths, cfg)
    fcfg = cfg.featurize_config()
    logmag, frame_mask = featurize_batch(waves, lengths, fcfg)
    chunks, chunk_mask = batched_temporal_chunks(
        logmag, frame_mask, cfg.num_frames
    )  # [B, C, Nt, F-1]
    B, C, Nt, F = chunks.shape
    eff_fs = cfg.target_fs or cfg.fs
    farr = freq_coords(F, eff_fs)
    tarr = time_coords(Nt, cfg.n_fft, eff_fs, cfg.hop_factor)
    if cfg.top_k is not None and cfg.top_k < Nt * F:
        # Fused extraction: top-K directly on the chunk magnitudes, then
        # compute coordinates only for the K winners — never materializes the
        # full Nt·F-point clouds (valid chunks are full grids, so top-K never
        # hits padding within a valid chunk; invalid chunks stay fully masked).
        mags = chunks.reshape(B, C, Nt * F)
        k = cfg.top_k
        if cfg.extraction == "approx":
            # bf16 keys AND bf16 selected magnitudes (the f32 re-gather costs
            # more than the selection itself at serving batch sizes)
            bvals, idx = jax.lax.approx_max_k(
                mags.astype(jnp.bfloat16), k, recall_target=cfg.approx_recall)
            vals = bvals.astype(mags.dtype)
        elif cfg.extraction == "exact" and k <= F:
            # per-frame top-k (a frame contributes at most k of the global
            # top-k) then combine — exact, cheaper than one 5120-wide sort.
            # NOTE the exact Pallas select kernel now supports any F
            # (non-lane-multiple bins ride a padded layout), but this path
            # selects on LOG-magnitude, which can be negative — remapping
            # to the kernel's non-negative domain (x − min) is monotone but
            # can collapse f32 near-ties and break bit-parity with
            # ``lax.top_k``, so the XLA form stays here (measured off the
            # critical path at framewise shapes — docs/PERFORMANCE.md r5).
            v1, i1 = jax.lax.top_k(chunks, k)              # [B, C, Nt, k]
            flat_i = i1 + jnp.arange(Nt)[None, None, :, None] * F
            vals, i2 = jax.lax.top_k(v1.reshape(B, C, Nt * k), k)
            idx = jnp.take_along_axis(flat_i.reshape(B, C, Nt * k), i2, axis=-1)
        else:
            vals, idx = jax.lax.top_k(mags, k)  # frequency-fastest flat idx
        # farr/tarr are linspace grids, so the coordinate lookup is affine in
        # the index — computed directly instead of gathering from the tables
        # (table gathers of ~3M indices measured ~20 ms at serving batch).
        cf = jnp.asarray(0.5 / (F - 1), vals.dtype)           # farr lane step
        ct = jnp.asarray(
            (cfg.hop_factor * cfg.n_fft / eff_fs) * Nt / (Nt - 1), vals.dtype)
        clouds = jnp.stack([(idx % F).astype(vals.dtype) * cf,
                            (idx // F).astype(vals.dtype) * ct, vals], axis=-1)
    else:
        clouds = grid_cloud(chunks, farr, tarr)  # [B, C, Nt*F, 3]
    K = clouds.shape[2]
    pmask = jnp.broadcast_to(chunk_mask[:, :, None], (B, C, K))
    return (PointCloud(points=clouds.reshape(B * C, K, 3),
                       mask=pmask.reshape(B * C, K)), chunk_mask)


def _select_kernel_ok(k: int, F: int) -> bool:
    """Exact-select kernel envelope check at the call site — falls back to
    the identical-semantics XLA two-stage top-k below, but LOUDLY, so a
    caller who forced ``exact_kernel=True`` at an out-of-envelope shape
    (e.g. framewise F=1025) doesn't silently measure the wrong path."""
    from pcaudio.ops.kernels.select import exact_topk_supported

    if exact_topk_supported(k, F):
        return True
    import warnings

    warnings.warn(
        f"exact select kernel unsupported at (K={k}, F={F}) "
        "(needs K <= 256); using XLA exact top-k instead")
    return False


def _extract_fused(waves: Array, lengths: Array,
                   cfg: TemporalPipelineConfig) -> Tuple[PointCloud, Array]:
    """Fused-kernel extraction: Pallas wave→|STFT|² + top-K on squared
    magnitudes (monotonic in log-magnitude) + winner-only log/normalize."""
    from pcaudio.ops.kernels.featurize import fused_chunk_mag2

    assert cfg.top_k is not None, "fused featurize needs a top-K budget"
    assert cfg.target_fs is None and cfg.hop_factor == 0.5 and \
        cfg.win_length in (None, cfg.n_fft), \
        "fused featurize covers the serving config; use featurize='xla'"
    approx = cfg.extraction == "approx"
    cdt = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    # The magnitude-grid dtype follows compute_dtype, independent of the
    # extraction mode: "exact" means the exact top-K SET of the grid the
    # featurizer produced (selection exactness), while grid precision is
    # its own knob (compute_dtype/stft_precision).  A bf16 grid halves the
    # kernel's HBM traffic and cuts the exact-select threshold search from
    # 31 to 15 probe rounds (bf16 has 7 mantissa bits).
    grid_dt = (jnp.bfloat16 if (approx or cfg.compute_dtype == "bfloat16")
               and cfg.stft_precision != "highest" else jnp.float32)
    m2, chunk_mask = fused_chunk_mag2(
        waves, lengths, n_fft=cfg.n_fft, num_frames=cfg.num_frames,
        trim=cfg.trim, top_db=cfg.top_db,
        out_dtype=grid_dt,
        compute_dtype=(jnp.float32 if cfg.stft_precision == "highest"
                       else jnp.bfloat16),
    )
    B, C, Nt, F = m2.shape
    mags = m2.reshape(B, C, Nt * F)
    k = cfg.top_k
    if approx:
        vals2, idx = jax.lax.approx_max_k(mags, k,
                                          recall_target=cfg.approx_recall)
    elif cfg._use_exact_kernel() and _select_kernel_ok(k, F):
        # sort-free exact top-K Pallas kernel: same selected SET as
        # ``lax.top_k`` (ties resolved take-first in flat order), ascending
        # flat-index output order.  Squared magnitudes are non-negative by
        # construction — the kernel's IEEE-code threshold search requires it.
        from pcaudio.ops.kernels.select import exact_topk_chunks

        ev, ei = exact_topk_chunks(m2.reshape(B * C, Nt, F), k)
        vals2 = ev.reshape(B, C, k)
        idx = ei.reshape(B, C, k)
    elif k <= F:
        v1, i1 = jax.lax.top_k(m2.reshape(B, C, Nt, F), k)
        flat_i = i1 + jnp.arange(Nt)[None, None, :, None] * F
        vals2, i2 = jax.lax.top_k(v1.reshape(B, C, Nt * k), k)
        idx = jnp.take_along_axis(flat_i.reshape(B, C, Nt * k), i2, axis=-1)
    else:
        vals2, idx = jax.lax.top_k(mags, k)
    # log-magnitude point values, winners only (f32 transcendental on K
    # points instead of the whole spectrogram)
    if cfg.stft_precision == "highest":
        vals = jnp.log(1.0e-8 + jnp.sqrt(vals2.astype(jnp.float32))
                       / cfg.n_fft).astype(cdt)
    else:
        # serving form: log(1e-8 + sqrt(v)/n) == 0.5·log(v) − log(n) up to
        # O(1e-8·n/sqrt(v)); flooring v at (1e-8·n)² pins the silent limit
        # to the reference's log(2e-8)-vs-log(1e-8) asymptote (≤ log 2
        # absolute, and floor-valued points are never top-K winners in a
        # chunk that has any signal).  Saves a sqrt+add per point.
        floor = (1.0e-8 * cfg.n_fft) ** 2
        vals = (0.5 * jnp.log(jnp.maximum(vals2.astype(jnp.float32), floor))
                - math.log(cfg.n_fft)).astype(cdt)
    cf = jnp.asarray(0.5 / (F - 1), cdt)
    ct = jnp.asarray(
        (cfg.hop_factor * cfg.n_fft / cfg.fs) * Nt / (Nt - 1), cdt)
    clouds = jnp.stack([(idx % F).astype(cdt) * cf,
                        (idx // F).astype(cdt) * ct, vals], axis=-1)
    pmask = jnp.broadcast_to(chunk_mask[:, :, None], (B, C, k))
    return (PointCloud(points=clouds.reshape(B * C, k, 3),
                       mask=pmask.reshape(B * C, k)), chunk_mask)


def make_temporal_classifier(model, cfg: TemporalPipelineConfig,
                             use_fused_st: bool = False):
    """Build ``fn(params, waves [B,L], lengths [B]) -> clip_logits [B,nclass]``.

    Chunk logits are computed with the set model on every (padded) chunk and
    averaged over valid chunks — padded chunks carry fully-masked clouds and
    are excluded from the mean.  ``use_fused_st=True`` routes the ST forward
    through the fully-fused Pallas kernel (serving path; ~2x on v5e).
    """

    def fn(params, waves: Array, lengths: Array) -> Array:
        logits, chunk_mask = _chunk_logits(params, waves, lengths, model, cfg,
                                           use_fused_st)
        w = chunk_mask[..., None].astype(logits.dtype)
        return jnp.sum(logits * w, axis=1) / jnp.maximum(
            jnp.sum(w, axis=1), jnp.asarray(1.0, logits.dtype)
        )

    return fn


def _chunk_logits(params, waves, lengths, model, cfg, use_fused_st):
    cloud, chunk_mask = extract_chunk_clouds(waves, lengths, cfg)
    B, C = chunk_mask.shape
    if use_fused_st:
        from pcaudio.ops.kernels.fused_st import fused_st_forward

        # mask=None: in this pipeline the cloud mask is chunk-level constant
        # (every point of a chunk valid or none — top-K clouds are always
        # full), so invalid chunks just produce finite garbage logits that
        # the chunk_mask weighting below drops; the mask-free kernel skips
        # all in-kernel bias work
        kw = {} if cfg.st_block_b is None else {"block_b": cfg.st_block_b}
        logits = fused_st_forward(
            params, cloud.points, None, num_heads=model.num_heads, **kw,
        ).reshape(B, C, -1)
    else:
        logits = model.apply(
            params, cloud.points, mask=cloud.mask
        ).reshape(B, C, -1)
    return logits, chunk_mask


def make_chunk_logits(model, cfg: TemporalPipelineConfig,
                      use_fused_st: bool = False):
    """Like :func:`make_temporal_classifier` but returns per-chunk logits and
    the chunk mask — the reference's unit of evaluation
    (``Code/pc_temp3d_eval.py``)."""

    def fn(params, waves: Array, lengths: Array):
        return _chunk_logits(params, waves, lengths, model, cfg, use_fused_st)

    return fn
