"""Fused-kernel extraction path == XLA extraction path (CPU interpret).

``featurize='fused'`` selects on squared magnitudes and logs only the K
winners; at f32 compute the selected point set must match the XLA path's.
"""
import dataclasses

import numpy as np

import jax.numpy as jnp

from pcaudio.eval.pipeline import TemporalPipelineConfig, extract_chunk_clouds


def _waves(B=2, L=32768, n=30000):
    rng = np.random.default_rng(0)
    w = np.zeros((B, L), np.float32)
    w[:, :n] = 0.1 * rng.standard_normal((B, n))
    return jnp.asarray(w), jnp.full((B,), n, jnp.int32)


def test_fused_extract_matches_xla_extract():
    waves, lengths = _waves()
    base = TemporalPipelineConfig(fs=44100, n_fft=1024, num_frames=10,
                                  top_k=64, trim=True, extraction="exact")
    ref_cloud, ref_cm = extract_chunk_clouds(waves, lengths, base)
    fus_cloud, fus_cm = extract_chunk_clouds(
        waves, lengths, dataclasses.replace(base, featurize="fused"))
    np.testing.assert_array_equal(np.asarray(ref_cm), np.asarray(fus_cm))
    vc = np.asarray(ref_cm).reshape(-1)

    ref = np.asarray(ref_cloud.points)[vc]
    fus = np.asarray(fus_cloud.points)[vc]
    # same selected point set: compare sorted magnitudes...
    rs = np.sort(ref[..., 2], axis=-1)
    fs_ = np.sort(fus[..., 2], axis=-1)
    np.testing.assert_allclose(fs_, rs, atol=2e-4, rtol=1e-4)
    # ...and the full (f, t, mag) triples as sets (lexicographic sort)
    for a, b in zip(ref, fus):
        a = a[np.lexsort(a.T)]
        b = b[np.lexsort(b.T)]
        np.testing.assert_allclose(b, a, atol=2e-4, rtol=1e-4)


import pytest


@pytest.mark.parametrize("compute_dtype", ["float32", "bfloat16"])
def test_exact_kernel_pipeline_matches_xla_exact_end_to_end(compute_dtype):
    """The serving exact path (sort-free Pallas select, interpret on CPU)
    produces the SAME point sets and the SAME classifications as the
    two-stage XLA exact path, end-to-end through the classifier.  At
    compute_dtype=bfloat16 (the serving headline config) both paths select
    on the same bf16 grid and the kernel searches only 7 mantissa bits."""
    import jax

    from pcaudio.eval.pipeline import make_temporal_classifier
    from pcaudio.nn import ST

    waves, lengths = _waves()
    base = TemporalPipelineConfig(fs=44100, n_fft=1024, num_frames=10,
                                  top_k=128, trim=True, extraction="exact",
                                  featurize="fused", exact_kernel=False,
                                  compute_dtype=compute_dtype)
    kcfg = dataclasses.replace(base, exact_kernel=True)
    ref_cloud, ref_cm = extract_chunk_clouds(waves, lengths, base)
    ker_cloud, ker_cm = extract_chunk_clouds(waves, lengths, kcfg)
    np.testing.assert_array_equal(np.asarray(ref_cm), np.asarray(ker_cm))
    vc = np.asarray(ref_cm).reshape(-1)
    ref = np.asarray(ref_cloud.points)[vc]
    ker = np.asarray(ker_cloud.points)[vc]
    # identical point SETS (order differs: ascending flat index vs
    # descending value) — exact equality, not allclose: same selection,
    # same log/normalize arithmetic
    for a, b in zip(ref, ker):
        a = a[np.lexsort(a.T)]
        b = b[np.lexsort(b.T)]
        np.testing.assert_array_equal(b, a)

    model = ST(dim_input=3, num_outputs=1, dim_output=10,
               num_inds=8, dim_hidden=16, num_heads=4)
    params = model.init(jax.random.key(0), jnp.zeros((1, 16, 3)))
    ref_logits = make_temporal_classifier(model, base)(params, waves, lengths)
    ker_logits = make_temporal_classifier(model, kcfg)(params, waves, lengths)
    assert (np.asarray(jnp.argmax(ref_logits, -1))
            == np.asarray(jnp.argmax(ker_logits, -1))).all()
    np.testing.assert_allclose(np.asarray(ker_logits),
                               np.asarray(ref_logits), atol=1e-5, rtol=1e-5)


def test_fused_extract_approx_close():
    waves, lengths = _waves()
    base = TemporalPipelineConfig(
        fs=44100, n_fft=1024, num_frames=10, top_k=64, trim=True,
        extraction="approx", compute_dtype="bfloat16",
        stft_precision="default", featurize="fused")
    cloud, cm = extract_chunk_clouds(waves, lengths, base)
    ref_cloud, _ = extract_chunk_clouds(
        waves, lengths,
        dataclasses.replace(base, featurize="xla", extraction="exact",
                            compute_dtype="float32",
                            stft_precision="highest"))
    vc = np.asarray(cm).reshape(-1)
    got = np.sort(np.asarray(cloud.points, np.float32)[vc][..., 2], axis=-1)
    ref = np.sort(np.asarray(ref_cloud.points)[vc][..., 2], axis=-1)
    # bf16 selection: selected mass must track the exact selection
    assert np.abs(got.mean() - ref.mean()) < 0.02 * np.abs(ref.mean()) + 1e-3
    np.testing.assert_allclose(got[:, 32:], ref[:, 32:], atol=0.1, rtol=2e-2)
