"""Property tests of the set models: permutation invariance (the paper's
central architectural claim - a set encoder must not care about point order)
and mask-semantics invariants."""
import numpy as np

import jax
import jax.numpy as jnp

from pcaudio.nn import ST, DeepSet, SetTransformer


def _model_and_cloud(din=2, K=40, B=3, seed=0):
    rng = np.random.default_rng(seed)
    model = ST(dim_input=din, dim_output=10, num_inds=8, dim_hidden=16,
               num_heads=4)
    params = model.init(jax.random.key(0), jnp.zeros((1, 8, din)))
    pts = rng.standard_normal((B, K, din)).astype(np.float32)
    return model, params, pts


def test_st_permutation_invariance():
    model, params, pts = _model_and_cloud()
    ref = model.apply(params, jnp.asarray(pts))
    rng = np.random.default_rng(1)
    perm = rng.permutation(pts.shape[1])
    got = model.apply(params, jnp.asarray(pts[:, perm]))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_st_masked_permutation_invariance():
    """Permuting valid points AND moving the padding around must not change
    logits (pad positions carry garbage)."""
    model, params, pts = _model_and_cloud(K=32)
    B, K, d = pts.shape
    n_valid = 20
    mask = np.zeros((B, K), bool)
    mask[:, :n_valid] = True
    pts_garbage = pts.copy()
    pts_garbage[:, n_valid:] = 777.0
    ref = model.apply(params, jnp.asarray(pts_garbage), mask=jnp.asarray(mask))

    # scatter the same valid points to random positions
    rng = np.random.default_rng(2)
    pts2 = np.full_like(pts, -555.0)
    mask2 = np.zeros((B, K), bool)
    for b in range(B):
        pos = rng.choice(K, n_valid, replace=False)
        order = rng.permutation(n_valid)
        pts2[b, pos] = pts_garbage[b, :n_valid][order]
        mask2[b, pos] = True
    got = model.apply(params, jnp.asarray(pts2), mask=jnp.asarray(mask2))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_deepset_and_generic_st_permutation_invariance():
    rng = np.random.default_rng(3)
    pts = jnp.asarray(rng.standard_normal((2, 30, 3)).astype(np.float32))
    perm = rng.permutation(30)
    for model in (DeepSet(dim_input=3, num_outputs=2, dim_output=5,
                          dim_hidden=16),
                  SetTransformer(dim_input=3, num_outputs=2, dim_output=5,
                                 num_inds=8, dim_hidden=16, num_heads=4)):
        params = model.init(jax.random.key(0), jnp.zeros((1, 8, 3)))
        a = model.apply(params, pts)
        b = model.apply(params, pts[:, perm])
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_fused_pipeline_matches_xla_pipeline():
    """use_fused_st=True must agree with the XLA model path end-to-end."""
    from pcaudio.eval import TemporalPipelineConfig, make_temporal_classifier

    rng = np.random.default_rng(4)
    B, L, n = 2, 32768, 30000
    waves = np.zeros((B, L), np.float32)
    waves[:, :n] = 0.1 * rng.standard_normal((B, n))
    lengths = jnp.full((B,), n, jnp.int32)
    cfg = TemporalPipelineConfig(fs=44100, n_fft=1024, num_frames=10, top_k=64)
    model = ST(dim_input=3, dim_output=10, num_inds=8, dim_hidden=16,
               num_heads=4)
    params = model.init(jax.random.key(0), jnp.zeros((1, 8, 3)))
    ref = make_temporal_classifier(model, cfg)(params, jnp.asarray(waves), lengths)
    got = make_temporal_classifier(model, cfg, use_fused_st=True)(
        params, jnp.asarray(waves), lengths)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=3e-2, rtol=3e-2)  # bf16 kernel matmuls
