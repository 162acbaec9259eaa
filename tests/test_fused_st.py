"""Fused whole-ST Pallas kernel == XLA model.apply (CPU interpret mode)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pcaudio.nn import ST
from pcaudio.ops.kernels.fused_st import fused_st_forward


@pytest.mark.parametrize("din,K,maskpat", [(3, 32, "full"), (2, 48, "ragged")])
def test_fused_st_matches_model(din, K, maskpat):
    rng = np.random.default_rng(0)
    B = 5
    model = ST(dim_input=din, dim_output=10, num_inds=8, dim_hidden=16,
               num_heads=4)
    params = model.init(jax.random.key(0), jnp.zeros((1, 8, din)))
    pts = jnp.asarray(rng.standard_normal((B, K, din)).astype(np.float32))
    if maskpat == "full":
        mask = None
    else:
        counts = np.array([K, K - 5, 10, 3, 1])
        mask = jnp.asarray(np.arange(K)[None, :] < counts[:, None])
    ref = model.apply(params, pts, mask=mask)
    got = fused_st_forward(params, pts, mask, num_heads=4, block_b=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=3e-2, rtol=3e-2)  # bf16 matmuls in kernel


def test_fused_st_fst_config_shapes():
    """The shipped FST/3ST configuration (dh=64, heads=8, inds=64)."""
    rng = np.random.default_rng(1)
    model = ST(dim_input=3, dim_output=10, num_inds=64, dim_hidden=64,
               num_heads=8)
    params = model.init(jax.random.key(0), jnp.zeros((1, 8, 3)))
    pts = jnp.asarray(rng.standard_normal((3, 64, 3)).astype(np.float32))
    ref = model.apply(params, pts)
    got = fused_st_forward(params, pts, None, num_heads=8, block_b=3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=5e-2, rtol=5e-2)


def test_fused_st_all_masked_rows_finite():
    """Fully-masked clouds (padded chunks) must yield finite logits."""
    rng = np.random.default_rng(2)
    model = ST(dim_input=3, dim_output=10, num_inds=8, dim_hidden=16,
               num_heads=4)
    params = model.init(jax.random.key(0), jnp.zeros((1, 8, 3)))
    B, K = 4, 32
    pts = jnp.asarray(rng.standard_normal((B, K, 3)).astype(np.float32))
    mask = jnp.asarray(np.array([[True] * K, [False] * K,
                                 [True] * K, [False] * K]))
    got = fused_st_forward(params, pts, mask, num_heads=4, block_b=2)
    assert np.all(np.isfinite(np.asarray(got)))
    # the valid rows still match the XLA path
    ref = model.apply(params, pts, mask=mask)
    np.testing.assert_allclose(np.asarray(got)[[0, 2]],
                               np.asarray(ref)[[0, 2]], atol=5e-2, rtol=5e-2)


@pytest.mark.parametrize("B", [1, 17, 16])
def test_fused_st_odd_batch_sizes(B):
    """Pair packing + block padding across awkward batch sizes."""
    rng = np.random.default_rng(B)
    model = ST(dim_input=3, dim_output=10, num_inds=8, dim_hidden=16,
               num_heads=4)
    params = model.init(jax.random.key(0), jnp.zeros((1, 8, 3)))
    pts = jnp.asarray(rng.standard_normal((B, 24, 3)).astype(np.float32))
    ref = model.apply(params, pts)
    got = fused_st_forward(params, pts, None, num_heads=4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=5e-2, rtol=5e-2)


@pytest.mark.parametrize("maskpat", ["full", "ragged"])
def test_fused_st_v7_matches_model(maskpat):
    """v7 (block-diagonal K/V MAB1 attend) == XLA model, masked + unmasked,
    at the shipped FST geometry."""
    rng = np.random.default_rng(7)
    B, K = 6, 48
    model = ST(dim_input=3, dim_output=10, num_inds=64, dim_hidden=64,
               num_heads=8)
    params = model.init(jax.random.key(0), jnp.zeros((1, 8, 3)))
    pts = jnp.asarray(rng.standard_normal((B, K, 3)).astype(np.float32))
    if maskpat == "full":
        mask = None
    else:
        counts = np.array([K, K - 7, 20, 9, 3, 1])
        mask = jnp.asarray(np.arange(K)[None, :] < counts[:, None])
    ref = model.apply(params, pts, mask=mask)
    got = fused_st_forward(params, pts, mask, num_heads=8, block_b=2,
                           variant="v7")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=5e-2, rtol=5e-2)


def test_fused_st_mask_free_variant_matches_masked_on_full_masks():
    """The mask-free compile (serving) equals the masked kernel when every
    point is valid."""
    rng = np.random.default_rng(3)
    model = ST(dim_input=3, dim_output=10, num_inds=8, dim_hidden=16,
               num_heads=4)
    params = model.init(jax.random.key(0), jnp.zeros((1, 8, 3)))
    pts = jnp.asarray(rng.standard_normal((18, 24, 3)).astype(np.float32))
    full = jnp.ones((18, 24), bool)
    a = fused_st_forward(params, pts, None, num_heads=4)
    b = fused_st_forward(params, pts, full, num_heads=4)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=1e-5, rtol=1e-5)
