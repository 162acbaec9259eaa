"""Explicit-collectives set-axis sharded ST == unsharded ST (8-device CPU
mesh: batch over `data`, points over `set`)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pcaudio.nn import ST
from pcaudio.parallel import make_mesh
from pcaudio.parallel.set_sharded import set_sharded_st_forward


@pytest.mark.parametrize("n_data,n_set", [(1, 8), (2, 4), (4, 2)])
def test_set_sharded_matches_unsharded(n_data, n_set):
    if jax.device_count() < n_data * n_set:
        pytest.skip("needs 8 virtual devices")
    rng = np.random.default_rng(0)
    B, N, din = 4, 64, 3
    model = ST(dim_input=din, num_outputs=1, dim_output=10, num_inds=16,
               dim_hidden=32, num_heads=4)
    params = model.init(jax.random.key(0), jnp.zeros((1, 8, din)))
    pts = jnp.asarray(rng.standard_normal((B, N, din)).astype(np.float32))
    counts = np.array([N, N - 9, N // 2, 5])
    mask = jnp.asarray(np.arange(N)[None, :] < counts[:, None])

    ref = model.apply(params, pts, mask=mask)
    mesh = make_mesh(n_data=n_data, n_set=n_set)
    got = set_sharded_st_forward(params, pts, mask, mesh, num_heads=4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_set_sharded_grads_flow():
    """Collectives are differentiable: grads through the sharded forward
    match the unsharded grads."""
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    rng = np.random.default_rng(1)
    B, N, din = 2, 32, 2
    model = ST(dim_input=din, num_outputs=1, dim_output=10, num_inds=8,
               dim_hidden=16, num_heads=4)
    params = model.init(jax.random.key(0), jnp.zeros((1, 8, din)))
    pts = jnp.asarray(rng.standard_normal((B, N, din)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 10, B))
    mesh = make_mesh(n_data=1, n_set=8)

    def loss_sharded(p):
        lg = set_sharded_st_forward(p, pts, None, mesh, num_heads=4)
        return -jnp.mean(jnp.take_along_axis(
            jax.nn.log_softmax(lg), labels[:, None], axis=1))

    def loss_ref(p):
        lg = model.apply(p, pts)
        return -jnp.mean(jnp.take_along_axis(
            jax.nn.log_softmax(lg), labels[:, None], axis=1))

    gs = jax.grad(loss_sharded)(params)
    gr = jax.grad(loss_ref)(params)
    for a, b in zip(jax.tree.leaves(gs), jax.tree.leaves(gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)


def test_set_sharded_serving_pipeline_combined_axes():
    """Combined data×set sharding on the SERVING path: waveforms → chunk
    clouds → set-sharded ST logits under a (data=2, set=4) mesh must match
    the unsharded pipeline end-to-end."""
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    from pcaudio.eval.pipeline import (
        TemporalPipelineConfig, extract_chunk_clouds,
    )

    rng = np.random.default_rng(2)
    B, L = 2, 16384
    waves = jnp.asarray((0.1 * rng.standard_normal((B, L))).astype(np.float32))
    lengths = jnp.full((B,), L, jnp.int32)
    cfg = TemporalPipelineConfig(fs=44100, n_fft=1024, num_frames=10,
                                 top_k=64, extraction="exact")
    cloud, cm = extract_chunk_clouds(waves, lengths, cfg)

    model = ST(dim_input=3, num_outputs=1, dim_output=10, num_inds=16,
               dim_hidden=32, num_heads=4)
    params = model.init(jax.random.key(0), jnp.zeros((1, 8, 3)))
    ref = model.apply(params, cloud.points, mask=cloud.mask)

    mesh = make_mesh(n_data=2, n_set=4)
    got = set_sharded_st_forward(params, cloud.points, cloud.mask, mesh,
                                 num_heads=4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)
