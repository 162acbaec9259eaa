"""Fused featurize kernel == the golden-tested XLA featurize chain (CPU
interpret mode).  ``log(1e-8 + sqrt(m²)/n_fft)`` over the kernel's squared
magnitudes must reproduce the logmag chunks on every valid chunk, including
the trim shift and both reflect-boundary frames."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pcaudio.dsp.featurize import FeaturizeConfig, featurize_batch, batched_temporal_chunks
from pcaudio.ops.kernels.featurize import fused_chunk_mag2


def _ref_chunks(waves, lengths, n_fft, trim):
    cfg = FeaturizeConfig(fs=44100, n_fft=n_fft, trim=trim)
    lm, fm = featurize_batch(waves, lengths, cfg)
    return batched_temporal_chunks(lm, fm, 10)


@pytest.mark.parametrize("trim", [False, True])
def test_fused_featurize_matches_xla(trim):
    rng = np.random.default_rng(0)
    B, L, n_fft = 3, 20480, 1024
    waves = np.zeros((B, L), np.float32)
    lengths = np.array([L, 17000, 9000], np.int32)
    for i, n in enumerate(lengths):
        waves[i, :n] = 0.2 * rng.standard_normal(n)
    # silence pads to exercise the trim shift
    if trim:
        waves[1, :2048] = 1e-6 * rng.standard_normal(2048)
        waves[2, :1024] = 0.0
    waves = jnp.asarray(waves)
    lengths = jnp.asarray(lengths)

    # f32 compute: structural parity with the golden-tested XLA chain
    m2, cmask = fused_chunk_mag2(waves, lengths, n_fft=n_fft, trim=trim,
                                 out_dtype=jnp.float32,
                                 compute_dtype=jnp.float32)
    got = np.log(1e-8 + np.sqrt(np.maximum(np.asarray(m2, np.float64), 0.0))
                 / n_fft)

    ref, ref_mask = _ref_chunks(waves, lengths, n_fft, trim)
    np.testing.assert_array_equal(np.asarray(cmask), np.asarray(ref_mask))
    vm = np.asarray(cmask)
    np.testing.assert_allclose(got[vm], np.asarray(ref)[vm],
                               atol=5e-4, rtol=1e-4)

    # bf16 compute (serving): same structure, precision-level deviations
    m2b, _ = fused_chunk_mag2(waves, lengths, n_fft=n_fft, trim=trim,
                              out_dtype=jnp.float32)
    magb = np.sqrt(np.maximum(np.asarray(m2b, np.float64), 0.0))[vm]
    mag = np.exp(np.asarray(ref)[vm]) * n_fft - 1e-8 * n_fft
    np.testing.assert_allclose(magb / n_fft + 1e-8, mag / n_fft + 1e-8,
                               rtol=0.08, atol=5e-4)


@pytest.mark.parametrize("dtypes", [(jnp.bfloat16, jnp.bfloat16),
                                    (jnp.float32, jnp.float32)])
def test_shift_onehot_matches_switch(dtypes):
    """The two trim-shift formulations (one-hot shift matmul vs the
    aligned-scratch 8-way switch) must agree bit-for-bit: selection
    commutes with the output rounding.  Exercises a trimmed clip so the
    shift is non-zero (s0 > 0)."""
    out_dt, comp_dt = dtypes
    rng = np.random.default_rng(1)
    B, L = 3, 20480
    waves = np.asarray(0.1 * rng.standard_normal((B, L)), np.float32)
    waves[2, :4000] = 0.0  # leading silence → trim shift engages
    waves[2, 16000:] = 0.0
    waves = jnp.asarray(waves)
    lengths = jnp.asarray([20000, 18000, L], jnp.int32)
    a, ma = fused_chunk_mag2(waves, lengths, out_dtype=out_dt,
                             compute_dtype=comp_dt, shift="switch")
    b, mb = fused_chunk_mag2(waves, lengths, out_dtype=out_dt,
                             compute_dtype=comp_dt, shift="onehot")
    np.testing.assert_array_equal(np.asarray(ma), np.asarray(mb))
    np.testing.assert_array_equal(
        np.asarray(a, np.float32), np.asarray(b, np.float32))


def test_fused_featurize_all_silent_clip_finite():
    waves = jnp.zeros((2, 8192), jnp.float32)
    lengths = jnp.asarray([8192, 0], jnp.int32)
    m2, cmask = fused_chunk_mag2(waves, lengths, n_fft=1024, trim=True,
                                 out_dtype=jnp.float32)
    assert np.isfinite(np.asarray(m2)).all()


def test_fused_featurize_sub_nfft_clip_masked_and_finite():
    """Clip shorter than n_fft with trim on: the kernel's single-bounce
    reflect produces garbage frames for tlen < n_fft, but every chunk of
    such a clip must be MASKED and the garbage finite — pins the invariant
    documented at ops/kernels/featurize.py (masked garbage stays masked)."""
    import dataclasses

    import jax

    from pcaudio.eval.pipeline import (
        TemporalPipelineConfig, make_temporal_classifier,
    )
    from pcaudio.nn import ST

    rng = np.random.default_rng(3)
    B, L, n_fft = 2, 16384, 1024
    waves = np.zeros((B, L), np.float32)
    # 700 < n_fft valid samples, then padding
    waves[:, :700] = 0.1 * rng.standard_normal((B, 700)).astype(np.float32)
    waves_j = jnp.asarray(waves)
    lengths = jnp.asarray([700, 300], jnp.int32)

    m2, cmask = fused_chunk_mag2(waves_j, lengths, n_fft=n_fft, trim=True,
                                 out_dtype=jnp.float32)
    assert not np.asarray(cmask).any(), "sub-n_fft clips must be fully masked"
    assert np.isfinite(np.asarray(m2)).all()

    # downstream: classifier logits stay finite through the fused pipeline
    cfg = TemporalPipelineConfig(fs=44100, n_fft=n_fft, num_frames=10,
                                 top_k=64, trim=True, extraction="exact",
                                 featurize="fused")
    model = ST(dim_input=3, num_outputs=1, dim_output=10,
               num_inds=8, dim_hidden=16, num_heads=4)
    params = model.init(jax.random.key(0), jnp.zeros((1, 16, 3)))
    logits = make_temporal_classifier(model, cfg)(params, waves_j, lengths)
    assert np.isfinite(np.asarray(logits)).all()
