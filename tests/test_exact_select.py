"""Exact top-K selection kernel == lax.top_k as a SET, incl. ties (CPU
interpret mode)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pcaudio.ops.kernels.select import exact_topk_chunks


def _ref_sets(mags, K):
    N, Nt, F = mags.shape
    flat = np.asarray(mags, np.float64).reshape(N, Nt * F)
    out = []
    for i in range(N):
        _, idx = jax.lax.top_k(jnp.asarray(flat[i]), K)
        out.append(set(np.asarray(idx).tolist()))
    return out


@pytest.mark.parametrize("compaction", ["gather", "scatter"])
@pytest.mark.parametrize("shape,K,block_c", [
    ((5, 10, 512), 128, 32),   # serving config
    ((3, 10, 512), 256, 32),
    ((4, 4, 128), 128, 32),    # K == Nt*F/4
    ((3, 16, 512), 128, 32),   # Nt*F=8192: partial-tail scatter piece
    ((3, 16, 512), 128, 64),   # smaller piece budget: 3 pieces, one partial
])
def test_exact_topk_matches_lax(shape, K, block_c, compaction):
    rng = np.random.default_rng(0)
    mags = jnp.asarray(np.abs(rng.standard_normal(shape)).astype(np.float32))
    vals, idx = exact_topk_chunks(mags, K, block_c=block_c,
                                  compaction=compaction)
    vals, idx = np.asarray(vals), np.asarray(idx)
    flat = np.asarray(mags).reshape(shape[0], -1)
    refs = _ref_sets(mags, K)
    for i in range(shape[0]):
        got = set(idx[i].tolist())
        assert len(got) == K, f"chunk {i}: duplicate output slots"
        assert got == refs[i], f"chunk {i}: set mismatch"
        np.testing.assert_array_equal(vals[i], flat[i][idx[i]])
        # ascending flat-index order
        assert (np.diff(idx[i]) > 0).all()


def test_exact_topk_bf16_serving_grid():
    """bf16 inputs (the serving spectrogram dtype) ride the
    single-value-channel scatter (bf16 values are f32-exact) and the
    7-round mantissa search; the selected set must equal lax.top_k over
    the same bf16 values, and returned values must be bit-exact."""
    rng = np.random.default_rng(3)
    shape, K = (5, 10, 512), 128
    mags = jnp.asarray(
        np.abs(rng.standard_normal(shape)).astype(np.float32)
    ).astype(jnp.bfloat16)
    flat32 = np.asarray(mags.astype(jnp.float32)).reshape(shape[0], -1)
    for compaction in ("gather", "scatter"):
        vals, idx = exact_topk_chunks(mags, K, compaction=compaction)
        idx = np.asarray(idx)
        for i in range(shape[0]):
            _, ridx = jax.lax.top_k(jnp.asarray(flat32[i]), K)
            assert set(idx[i].tolist()) == set(np.asarray(ridx).tolist())
            np.testing.assert_array_equal(np.asarray(vals)[i],
                                          flat32[i][idx[i]])


def test_exact_topk_wide_exponent_range():
    """Values spanning many f32 exponents (1e-9 … 1e9, the regression for
    the overflowing 2^(d·32) candidate constants: any chunk whose K-th
    value was ≥ 4.0 lost its top exponent digits and selected garbage)."""
    rng = np.random.default_rng(7)
    shape, K = (4, 10, 512), 128
    mags = (np.abs(rng.standard_normal(shape)) *
            10.0 ** rng.uniform(-9, 9, shape)).astype(np.float32)
    vals, idx = exact_topk_chunks(jnp.asarray(mags), K)
    idx = np.asarray(idx)
    refs = _ref_sets(jnp.asarray(mags), K)
    flat = mags.reshape(shape[0], -1)
    for i in range(shape[0]):
        assert set(idx[i].tolist()) == refs[i], f"chunk {i}: set mismatch"
        np.testing.assert_array_equal(np.asarray(vals)[i], flat[i][idx[i]])


def test_exact_topk_ties_take_first():
    """Many equal values: the kernel keeps the lowest flat indices, exactly
    like lax.top_k."""
    N, Nt, F, K = 2, 4, 128, 128
    mags = np.full((N, Nt, F), 0.5, np.float32)
    mags[0, 0, :4] = 2.0          # 4 clear winners, 124 ties at 0.5
    mags[1, 3, -1] = 7.0
    vals, idx = exact_topk_chunks(jnp.asarray(mags), K)
    idx = np.asarray(idx)
    ref = _ref_sets(jnp.asarray(mags), K)
    for i in range(N):
        assert set(idx[i].tolist()) == ref[i]


def test_exact_topk_zero_chunks_finite():
    mags = jnp.zeros((3, 10, 512), jnp.float32)
    vals, idx = exact_topk_chunks(mags, 128)
    assert np.isfinite(np.asarray(vals)).all()
    # all-zero: ties at 0.0 → first 128 flat indices
    np.testing.assert_array_equal(np.asarray(idx)[0], np.arange(128))


@pytest.mark.parametrize("compaction", ["gather", "scatter"])
@pytest.mark.parametrize("shape,K", [
    ((3, 1, 1025), 128),   # framewise FST frame (Nfft=2048 -> 1025 bins)
    ((3, 10, 513), 128),   # temporal XLA grid with Nyquist kept
    ((2, 4, 130), 64),     # tiny non-multiple
])
def test_exact_topk_nonmultiple_F(shape, K, compaction):
    """Non-lane-multiple F rides a zero-padded layout; the selected SET and
    the returned [Nt, F] flat indices must still match lax.top_k exactly."""
    rng = np.random.default_rng(11)
    mags = jnp.asarray(np.abs(rng.standard_normal(shape)).astype(np.float32))
    vals, idx = exact_topk_chunks(mags, K, compaction=compaction)
    vals, idx = np.asarray(vals), np.asarray(idx)
    flat = np.asarray(mags).reshape(shape[0], -1)
    refs = _ref_sets(mags, K)
    for i in range(shape[0]):
        got = set(idx[i].tolist())
        assert len(got) == K and got == refs[i]
        np.testing.assert_array_equal(vals[i], flat[i][idx[i]])
        assert (np.diff(idx[i]) > 0).all()


def test_exact_topk_nonmultiple_F_zero_ties_exclude_pads():
    """The degenerate τ=0 tie cut with F % 128 != 0: pad lanes are 0.0 and
    tie with real zeros — they must NEVER be selected, and the tie order
    must be the UNPADDED flat order (lax.top_k semantics)."""
    N, Nt, F, K = 2, 3, 200, 64
    mags = np.zeros((N, Nt, F), np.float32)
    mags[1, 1, 5] = 1.0  # one real winner; the rest of the cut is zeros
    vals, idx = exact_topk_chunks(jnp.asarray(mags), K)
    idx = np.asarray(idx)
    refs = _ref_sets(jnp.asarray(mags), K)
    for i in range(N):
        assert set(idx[i].tolist()) == refs[i]
        assert (idx[i] < Nt * F).all()
    # all-zero chunk: first K unpadded flat indices
    np.testing.assert_array_equal(idx[0], np.arange(K))
