"""Fused Pallas attention kernel == XLA reference path (CPU interpret mode)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pcaudio.nn import ST, MAB


@pytest.mark.parametrize("mask_frac", [None, 0.7])
def test_fused_mab_matches_xla(mask_frac):
    rng = np.random.default_rng(0)
    B, N, M, dq, dk = 5, 16, 24, 6, 7
    Q = jnp.asarray(rng.standard_normal((B, N, dq)).astype(np.float32))
    K = jnp.asarray(rng.standard_normal((B, M, dk)).astype(np.float32))
    mask = None
    if mask_frac is not None:
        mask = jnp.asarray(rng.random((B, M)) < mask_frac)
    ref_m = MAB(dim_V=8, num_heads=2)
    params = ref_m.init(jax.random.key(0), Q, K)
    ref = ref_m.apply(params, Q, K, key_mask=mask)
    fused_m = MAB(dim_V=8, num_heads=2, fused_attn=True)
    got = fused_m.apply(params, Q, K, key_mask=mask)
    # the trainable kernel runs its matmuls in bf16 (precision floor ~1e-2
    # relative); forward parity at bf16 tolerance, exactness is covered by
    # the f32 golden tests of the XLA path
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-2, rtol=2e-2)


def test_fused_st_matches_xla():
    rng = np.random.default_rng(1)
    B, K = 4, 64
    pts = jnp.asarray(rng.standard_normal((B, K, 2)).astype(np.float32))
    mask = jnp.asarray(np.arange(K)[None, :] < np.array([64, 50, 10, 1])[:, None])
    model = ST(dim_input=2, dim_output=10, num_inds=16, dim_hidden=32, num_heads=4)
    params = model.init(jax.random.key(0), pts)
    ref = model.apply(params, pts, mask=mask)
    fused = ST(dim_input=2, dim_output=10, num_inds=16, dim_hidden=32,
               num_heads=4, fused_attn=True)
    got = fused.apply(params, pts, mask=mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=5e-2, rtol=5e-2)
