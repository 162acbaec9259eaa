"""End-to-end pipeline tests (CPU): fused extraction equivalence, masking,
clip classification shape/finiteness."""
import numpy as np

import jax
import jax.numpy as jnp

from pcaudio.eval import (
    TemporalPipelineConfig,
    extract_chunk_clouds,
    make_temporal_classifier,
)
from pcaudio.nn import ST
from pcaudio.ops import grid_cloud, top_k_points_masked
from pcaudio.ops.cloud import freq_coords, time_coords
from pcaudio.dsp.featurize import FeaturizeConfig, featurize_batch, batched_temporal_chunks


def _waves(B=2, L=32768, n=30000):
    rng = np.random.default_rng(0)
    w = np.zeros((B, L), np.float32)
    w[:, :n] = 0.1 * rng.standard_normal((B, n))
    return jnp.asarray(w), jnp.full((B,), n, jnp.int32)


def test_fused_extraction_matches_unfused():
    waves, lengths = _waves()
    cfg = TemporalPipelineConfig(fs=44100, n_fft=1024, num_frames=10,
                                 top_k=64, trim=False)
    cloud, cmask = jax.jit(
        lambda w, l: extract_chunk_clouds(w, l, cfg)
    )(waves, lengths)

    # unfused reference: full clouds then masked top-K
    lm, fm = featurize_batch(waves, lengths, cfg.featurize_config())
    chunks, cm = batched_temporal_chunks(lm, fm, 10)
    farr = freq_coords(512, 44100)
    tarr = time_coords(10, 1024, 44100, 0.5)
    full = grid_cloud(chunks, farr, tarr)
    fmask = jnp.broadcast_to(cm[..., None], full.shape[:-1])
    ref, ref_mask = top_k_points_masked(full, fmask, 64)

    vc = np.asarray(cmask)
    np.testing.assert_array_equal(vc, np.asarray(cm))
    B, C = vc.shape
    got = np.asarray(cloud.points).reshape(B, C, 64, 3)[vc]
    want = np.asarray(ref)[vc]
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_temporal_classifier_end_to_end():
    waves, lengths = _waves()
    cfg = TemporalPipelineConfig(fs=44100, n_fft=1024, num_frames=10, top_k=64)
    model = ST(dim_input=3, dim_output=10, num_inds=8, dim_hidden=16, num_heads=2)
    params = model.init(jax.random.key(0), jnp.zeros((1, 8, 3)))
    fn = jax.jit(make_temporal_classifier(model, cfg))
    logits = fn(params, waves, lengths)
    assert logits.shape == (2, 10)
    assert np.isfinite(np.asarray(logits)).all()


def test_classifier_ignores_padding_chunks():
    """Same audio in a longer buffer (more padded chunks) -> same logits."""
    waves, lengths = _waves(B=1, L=32768, n=20000)
    big = jnp.pad(waves, ((0, 0), (0, 16384)))
    cfg = TemporalPipelineConfig(fs=44100, n_fft=1024, num_frames=10,
                                 top_k=64, trim=False)
    model = ST(dim_input=3, dim_output=10, num_inds=8, dim_hidden=16, num_heads=2)
    params = model.init(jax.random.key(0), jnp.zeros((1, 8, 3)))
    fn = make_temporal_classifier(model, cfg)
    a = fn(params, waves, lengths)
    b = fn(params, big, lengths)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_extraction_modes_consistent():
    """Two-stage exact == flat sort (same set); approx has high recall."""
    import dataclasses
    waves, lengths = _waves()
    base = TemporalPipelineConfig(fs=44100, n_fft=1024, num_frames=10,
                                  top_k=64, trim=False)
    exact, cm = extract_chunk_clouds(waves, lengths, base)
    flatc, _ = extract_chunk_clouds(
        waves, lengths, dataclasses.replace(base, extraction="flat"))
    vc = np.asarray(cm).reshape(-1)
    a = np.sort(np.asarray(exact.points)[vc][..., 2], axis=-1)
    b = np.sort(np.asarray(flatc.points)[vc][..., 2], axis=-1)
    np.testing.assert_allclose(a, b, rtol=1e-6)
    approx, _ = extract_chunk_clouds(
        waves, lengths, dataclasses.replace(base, extraction="approx"))
    av = np.sort(np.asarray(approx.points)[vc][..., 2], axis=-1)
    # approx mode selects under bf16 ordering (ties at the boundary may
    # differ on noise inputs) and returns bf16-rounded magnitudes: check the
    # selected mass matches the exact selection closely
    assert np.abs(av.mean() - b.mean()) < 0.02 * np.abs(b.mean()) + 1e-3
    # and the top half (well above the tie boundary) agrees point-for-point
    np.testing.assert_allclose(av[:, 32:], b[:, 32:], rtol=1e-2)
