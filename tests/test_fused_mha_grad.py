"""fused_mha custom-VJP gradients == XLA attention gradients (CPU
interpret mode), both attention directions + masking + query tiling."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pcaudio.nn.attention import masked_softmax
from pcaudio.ops.kernels.mha import fused_mha


def _xla_mha(q, k, v, mask, h, scale):
    B, N, dv = q.shape
    M = k.shape[1]
    dh = dv // h
    qh = q.reshape(B, N, h, dh)
    kh = k.reshape(B, M, h, dh)
    vh = v.reshape(B, M, h, dh)
    logits = jnp.einsum("bnhd,bmhd->bhnm", qh, kh) * scale
    mb = None if mask is None else mask[:, None, None, :]
    attn = masked_softmax(logits, mb, axis=-1)
    return jnp.einsum("bhnm,bmhd->bnhd", attn, vh).reshape(B, N, dv)


@pytest.mark.parametrize("N,M,maskpat,tile", [
    (33, 8, "ragged", 256),   # MAB1 direction, uneven N, single tile
    (8, 40, "ragged", 256),   # MAB0 direction, masked keys
    (70, 16, "full", 32),     # multi-tile query axis (padding in play)
])
def test_fused_mha_grads_match_xla(N, M, maskpat, tile):
    rng = np.random.default_rng(0)
    B, h, dv = 5, 4, 16
    scale = 1.0 / np.sqrt(dv)
    q = jnp.asarray(rng.standard_normal((B, N, dv)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, M, dv)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, M, dv)).astype(np.float32))
    if maskpat == "full":
        mask = None
    else:
        counts = np.array([M, M - 3, M // 2, 1, 0])[:B]
        mask = jnp.asarray(np.arange(M)[None, :] < counts[:, None])
    cot = jnp.asarray(rng.standard_normal((B, N, dv)).astype(np.float32))

    def loss_fused(q, k, v):
        return jnp.sum(fused_mha(q, k, v, mask, num_heads=h, scale=scale,
                                 block_b=2, tile_n=tile) * cot)

    def loss_xla(q, k, v):
        return jnp.sum(_xla_mha(q, k, v, mask, h, scale) * cot)

    out_f = fused_mha(q, k, v, mask, num_heads=h, scale=scale, block_b=2,
                      tile_n=tile)
    out_x = _xla_mha(q, k, v, mask, h, scale)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_x),
                               atol=2e-2, rtol=2e-2)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gf, gx, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=3e-2, rtol=3e-2,
            err_msg=f"d{name} mismatch")


def test_fused_attn_model_grads_match():
    """End-to-end: ST(fused_attn=True) grads == ST(fused_attn=False)."""
    from pcaudio.nn import ST

    rng = np.random.default_rng(1)
    B, K = 4, 24
    pts = jnp.asarray(rng.standard_normal((B, K, 3)).astype(np.float32))
    counts = np.array([K, K - 5, 10, 3])
    mask = jnp.asarray(np.arange(K)[None, :] < counts[:, None])
    labels = jnp.asarray(rng.integers(0, 10, B))

    def make(fused):
        return ST(dim_input=3, dim_output=10, num_inds=8, dim_hidden=16,
                  num_heads=4, fused_attn=fused)

    params = make(False).init(jax.random.key(0), jnp.zeros((1, 8, 3)))

    def loss(params, fused):
        logits = make(fused).apply(params, pts, mask=mask)
        lp = jax.nn.log_softmax(logits)
        return -jnp.mean(jnp.take_along_axis(lp, labels[:, None], axis=1))

    gx = jax.grad(lambda p: loss(p, False))(params)
    gf = jax.grad(lambda p: loss(p, True))(params)
    flat_x = jax.tree.leaves(gx)
    flat_f = jax.tree.leaves(gf)
    for a, b in zip(flat_f, flat_x):
        # bf16 kernel matmuls vs the f32 XLA path: the forward logits already
        # differ at ~1e-2, so per-element gradient noise of a few 1e-2 on
        # O(0.1) entries is the expected precision floor, not an error
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=6e-2, rtol=5e-2)


@pytest.mark.parametrize("N,M,maskpat,tile", [
    (33, 8, "ragged", 256),   # MAB1 direction (small keys) — bd_kv's target
    (8, 40, "ragged", 256),   # MAB0 direction (keys > queries)
    (70, 16, "full", 32),     # multi-tile query axis (padding in play)
])
def test_bd_kv_form_matches_xla(N, M, maskpat, tile):
    """The bd_kv attend geometry (fused-ST v7 layout, trainable port) must
    match XLA forward + grads exactly like bd_q does — including masked and
    all-masked key rows (zero outputs, zero grads)."""
    rng = np.random.default_rng(2)
    B, h, dv = 5, 4, 16
    scale = 1.0 / np.sqrt(dv)
    q = jnp.asarray(rng.standard_normal((B, N, dv)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, M, dv)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, M, dv)).astype(np.float32))
    if maskpat == "full":
        mask = None
    else:
        counts = np.array([M, M - 3, M // 2, 1, 0])[:B]
        mask = jnp.asarray(np.arange(M)[None, :] < counts[:, None])
    cot = jnp.asarray(rng.standard_normal((B, N, dv)).astype(np.float32))

    def loss_kv(q, k, v):
        return jnp.sum(fused_mha(q, k, v, mask, num_heads=h, scale=scale,
                                 block_b=2, tile_n=tile, form="bd_kv") * cot)

    def loss_xla(q, k, v):
        return jnp.sum(_xla_mha(q, k, v, mask, h, scale) * cot)

    out_f = fused_mha(q, k, v, mask, num_heads=h, scale=scale, block_b=2,
                      tile_n=tile, form="bd_kv")
    out_x = _xla_mha(q, k, v, mask, h, scale)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_x),
                               atol=2e-2, rtol=2e-2)

    gf = jax.grad(loss_kv, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gf, gx, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=3e-2, rtol=3e-2,
            err_msg=f"d{name} mismatch")


def test_bd_kv_auto_selection():
    """form='auto' picks bd_kv iff h·M ≤ N; both routes stay numerically
    consistent with each other on an ISAB-shaped attend."""
    rng = np.random.default_rng(3)
    B, h, dv, N, M = 3, 4, 16, 128, 8   # h·M = 32 ≤ N → bd_kv
    scale = 1.0 / np.sqrt(dv)
    q = jnp.asarray(rng.standard_normal((B, N, dv)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, M, dv)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, M, dv)).astype(np.float32))
    a = fused_mha(q, k, v, None, num_heads=h, scale=scale, form="auto")
    b = fused_mha(q, k, v, None, num_heads=h, scale=scale, form="bd_q")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=2e-2, rtol=2e-2)
