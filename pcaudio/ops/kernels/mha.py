"""Fused masked multi-head set-attention Pallas kernels — forward AND
backward (``jax.custom_vjp``), so ``MAB(fused_attn=True)`` is trainable.

The XLA path materializes the per-head logits tensor ``[B, h, N, M]`` in HBM
(~3 GB per MAB at serving batch sizes) and re-reads it for softmax and A·V —
measured HBM-bound on v5e.  These kernels keep the logits/probability tiles
in VMEM; HBM traffic collapses to q/k/v(/g) and the outputs.

Design (same cost model as the fused-ST kernel, ``fused_st.py``): per-op
overhead dominates at tiny head dims, so per-head small matmuls are collapsed
into dense ones with the block-diagonal trick —

    lg  = BD(q)·kᵀ·scale + bias     BD(q) [h·N, dv]: head h's rows keep only
    a   = row_softmax(lg)           its feature columns (one VPU mask-mul)
    out = Σ_h (a·v).reshape(h,N,dv) ⊙ colmask

and the backward pass reuses the same layout (probabilities recomputed in
VMEM, flash-style — no residual attention tensor):

    da  = BD(g)·vᵀ                  dlg = a ⊙ (da − rowsum(da ⊙ a)) · scale
    dq  = Σ_h head-block of dlg·k   dk = dlgᵀ·BD(q)      dv = aᵀ·BD(g)

Queries are tiled over the grid (``tile_n``) so training-size sets
(N = 1025 points, ``Code/settransformer.py``) fit VMEM; dk/dv accumulate
across query tiles in the output blocks.

Semantics exactly match :func:`pcaudio.nn.attention.masked_softmax` +
reference MAB math (``set_transformer-master/modules.py:19-29``): scale
``1/√dim_V`` (not per-head), key-mask → −0.7·f32max before softmax,
all-masked rows produce zeros (and therefore zero gradients).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def _colmask(h: int, dv: int):
    lane = jax.lax.broadcasted_iota(jnp.int32, (h, 1, dv), 2)
    head = jax.lax.broadcasted_iota(jnp.int32, (h, 1, dv), 0)
    return (lane // (dv // h) == head).astype(jnp.float32)


def _bd(x, h: int):
    """[rows, dv] → block-diagonal [h·rows, dv] bf16."""
    rows, dv = x.shape
    return (x[None, :, :] * _colmask(h, dv)).reshape(h * rows, dv).astype(
        jnp.bfloat16)


def _head_sum(x, h: int, rows: int, dv: int):
    return jnp.sum(x.reshape(h, rows, dv) * _colmask(h, dv), axis=0)


def _probs(q, k, bias, h, scale):
    """Guarded attention probabilities [h·N, M] for one sample tile."""
    lg = jax.lax.dot_general(
        _bd(q, h), k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale + bias
    mx = jnp.max(lg, axis=-1, keepdims=True)
    p = jnp.exp(lg - mx)
    p = jnp.where(lg <= _MASK_VALUE * 0.5, 0.0, p)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    return p * jnp.where(denom == 0.0, 0.0,
                         1.0 / jnp.where(denom == 0.0, 1.0, denom))


def _seg_softmax(lg, h: int, M: int, bias=None):
    """Exact per-segment softmax over ``[rows, h·M]`` logits where segment
    g occupies lanes ``[g·M, (g+1)·M)`` (the bd_kv layout).  Max-subtract and
    normalization are done per segment (static lane slices) — identical
    semantics to the bd_q row softmax, all-masked segments → zeros.

    ``bias`` ([1, M] additive mask bias) is applied per segment here rather
    than pre-tiled across the h·M logit lanes: Mosaic cannot lower a 1D
    h-fold tile of a 64-lane vector (``tpu.concatenate`` offsets outside
    the first tile), and every segment sees the identical key mask anyway."""
    parts = []
    for g_i in range(h):
        seg = lg[:, g_i * M:(g_i + 1) * M]
        if bias is not None:
            seg = seg + bias
        mx = jnp.max(seg, axis=-1, keepdims=True)
        p = jnp.exp(seg - mx)
        p = jnp.where(seg <= _MASK_VALUE * 0.5, 0.0, p)
        den = jnp.sum(p, axis=-1, keepdims=True)
        parts.append(p * jnp.where(den == 0.0, 0.0,
                                   1.0 / jnp.where(den == 0.0, 1.0, den)))
    return jnp.concatenate(parts, axis=-1)


def _fwd_kernel_kv(q_ref, k_ref, v_ref, mask_ref, o_ref, *, num_heads, scale,
                   block_b):
    """bd_kv forward: block-diagonalize the (small) K/V side instead of the
    queries — the fused-ST v7 geometry (``fused_st.py::mab1_attend_v7``)
    carried over to the trainable kernel.  Per sample:

        lg = q · BD(k)ᵀ · scale + bias_tiled     [tn, h·M]
        a  = seg_softmax(lg)                      (exact, per head segment)
        o  = a · BD(v)                            [tn, dv]  — directly
                                                  head-concatenated

    vs bd_q's ``[h·tn, M]`` layout: softmax rows drop 8x, the av output
    lands in ``[tn, dv]`` with no head-sum mask-reduce."""
    h = num_heads
    M = k_ref.shape[-2]
    for s in range(block_b):
        kbd = _bd(k_ref[s].astype(jnp.float32), h)           # [h·M, dv] bf16
        vbd = _bd(v_ref[s].astype(jnp.float32), h)
        bias = jnp.where(mask_ref[s] > 0, 0.0, _MASK_VALUE)[None, :]  # [1, M]
        lg = jax.lax.dot_general(
            q_ref[s].astype(jnp.bfloat16), kbd,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        a = _seg_softmax(lg, h, M, bias)
        o_ref[s] = jax.lax.dot_general(
            a.astype(jnp.bfloat16), vbd,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _bwd_kernel_kv(q_ref, k_ref, v_ref, mask_ref, g_ref,
                   dq_ref, dk_ref, dv_ref, *, num_heads, scale, block_b):
    """bd_kv backward (flash-style recompute, same layout as the forward):

        da  = g · BD(v)ᵀ                          [tn, h·M]
        dlg = a ⊙ (da − segsum(da ⊙ a)) · scale
        dq  = dlg · BD(k)                         [tn, dv]
        dk  = head_collapse(dlgᵀ · q)             [M, dv]
        dv  = head_collapse(aᵀ · g)               [M, dv]

    dk/dv accumulate across query tiles (sequential second grid axis)."""
    h = num_heads
    M = k_ref.shape[-2]
    dv_feat = q_ref.shape[-1]
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        dk_ref[...] = jnp.zeros(dk_ref.shape, dk_ref.dtype)
        dv_ref[...] = jnp.zeros(dv_ref.shape, dv_ref.dtype)

    for s in range(block_b):
        q = q_ref[s].astype(jnp.float32)
        g = g_ref[s].astype(jnp.float32)
        kbd = _bd(k_ref[s].astype(jnp.float32), h)           # [h·M, dv] bf16
        vbd = _bd(v_ref[s].astype(jnp.float32), h)
        bias = jnp.where(mask_ref[s] > 0, 0.0, _MASK_VALUE)[None, :]
        lg = jax.lax.dot_general(
            q.astype(jnp.bfloat16), kbd,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        a = _seg_softmax(lg, h, M, bias)                     # [tn, h·M]
        gb = g.astype(jnp.bfloat16)
        da = jax.lax.dot_general(
            gb, vbd, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)              # [tn, h·M]
        daa = da * a
        segsum = []
        for g_i in range(h):
            seg = daa[:, g_i * M:(g_i + 1) * M]
            segsum.append(jnp.broadcast_to(
                jnp.sum(seg, axis=-1, keepdims=True), seg.shape))
        dlg = (a * (da - jnp.concatenate(segsum, axis=-1)) * scale
               ).astype(jnp.bfloat16)                        # [tn, h·M]
        dq_ref[s] = jax.lax.dot_general(
            dlg, kbd, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dq_ref.dtype)
        dk_full = jax.lax.dot_general(
            dlg, q.astype(jnp.bfloat16),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)              # [h·M, dv]
        dv_full = jax.lax.dot_general(
            a.astype(jnp.bfloat16), gb,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)              # [h·M, dv]
        dk_ref[s] += _head_sum(dk_full, h, M, dv_feat)
        dv_ref[s] += _head_sum(dv_full, h, M, dv_feat)


def _fwd_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, num_heads, scale,
                block_b):
    h = num_heads
    tn, dv = q_ref.shape[-2], q_ref.shape[-1]
    for s in range(block_b):
        bias = jnp.where(mask_ref[s] > 0, 0.0, _MASK_VALUE)[None, :]
        a = _probs(q_ref[s].astype(jnp.float32), k_ref[s].astype(jnp.bfloat16),
                   bias, h, scale)
        av = jnp.dot(a.astype(jnp.bfloat16), v_ref[s].astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)     # [h·tn, dv]
        o_ref[s] = _head_sum(av, h, tn, dv).astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, mask_ref, g_ref,
                dq_ref, dk_ref, dv_ref, *, num_heads, scale, block_b):
    h = num_heads
    tn, dv = q_ref.shape[-2], q_ref.shape[-1]
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        dk_ref[...] = jnp.zeros(dk_ref.shape, dk_ref.dtype)
        dv_ref[...] = jnp.zeros(dv_ref.shape, dv_ref.dtype)

    for s in range(block_b):
        k = k_ref[s].astype(jnp.bfloat16)
        v = v_ref[s].astype(jnp.bfloat16)
        bias = jnp.where(mask_ref[s] > 0, 0.0, _MASK_VALUE)[None, :]
        bdq = _bd(q_ref[s].astype(jnp.float32), h)           # [h·tn, dv]
        a = _probs(q_ref[s].astype(jnp.float32), k, bias, h, scale)
        bdg = _bd(g_ref[s].astype(jnp.float32), h)
        da = jax.lax.dot_general(
            bdg, v, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)              # [h·tn, M]
        dlg = (a * (da - jnp.sum(da * a, axis=-1, keepdims=True))
               * scale).astype(jnp.bfloat16)
        dq_ref[s] = _head_sum(
            jnp.dot(dlg, k, preferred_element_type=jnp.float32), h, tn, dv
        ).astype(dq_ref.dtype)
        dk_ref[s] += jax.lax.dot_general(
            dlg, bdq, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)              # [M, dv]
        dv_ref[s] += jax.lax.dot_general(
            a.astype(jnp.bfloat16), bdg,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)


def _pad_to(x, size, axis):
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    cfg = [(0, 0)] * x.ndim
    cfg[axis] = (0, pad)
    return jnp.pad(x, cfg)


def _tiles(N: int, tile_n: int):
    nt = max(1, -(-N // tile_n))
    return nt, nt * tile_n


def _mha_fwd_impl(q, k, v, mask, num_heads, scale, block_b, tile_n,
                  interpret, form="bd_q"):
    B, N, dv = q.shape
    M = k.shape[1]
    nt, Np = _tiles(N, tile_n)
    tn = Np // nt
    pad_b = (-B) % block_b
    Bp = B + pad_b
    qp = _pad_to(_pad_to(q, Np, 1), Bp, 0)
    kp = _pad_to(k, Bp, 0)
    vp = _pad_to(v, Bp, 0)
    maskp = _pad_to(mask, Bp, 0)
    if pad_b:  # padded samples: fully-valid mask keeps softmax finite
        maskp = maskp.at[B:].set(1.0)

    kern = functools.partial(
        _fwd_kernel_kv if form == "bd_kv" else _fwd_kernel,
        num_heads=num_heads, scale=scale, block_b=block_b)
    out = pl.pallas_call(
        kern,
        interpret=interpret,
        out_shape=jax.ShapeDtypeStruct((Bp, Np, dv), jnp.float32),
        grid=(Bp // block_b, nt),
        in_specs=[
            pl.BlockSpec((block_b, tn, dv), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, M, dv), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, M, dv), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, M), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_b, tn, dv), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
    )(qp, kp, vp, maskp)
    return out[:B, :N]


def _mha_bwd_impl(q, k, v, mask, g, num_heads, scale, block_b, tile_n,
                  interpret, form="bd_q"):
    B, N, dv = q.shape
    M = k.shape[1]
    nt, Np = _tiles(N, tile_n)
    tn = Np // nt
    pad_b = (-B) % block_b
    Bp = B + pad_b
    qp = _pad_to(_pad_to(q, Np, 1), Bp, 0)
    gp = _pad_to(_pad_to(g, Np, 1), Bp, 0)
    kp = _pad_to(k, Bp, 0)
    vp = _pad_to(v, Bp, 0)
    maskp = _pad_to(mask, Bp, 0)
    if pad_b:
        maskp = maskp.at[B:].set(1.0)

    kern = functools.partial(
        _bwd_kernel_kv if form == "bd_kv" else _bwd_kernel,
        num_heads=num_heads, scale=scale, block_b=block_b)
    dq, dk, dv_ = pl.pallas_call(
        kern,
        interpret=interpret,
        out_shape=(
            jax.ShapeDtypeStruct((Bp, Np, dv), jnp.float32),
            jax.ShapeDtypeStruct((Bp, M, dv), jnp.float32),
            jax.ShapeDtypeStruct((Bp, M, dv), jnp.float32),
        ),
        grid=(Bp // block_b, nt),
        in_specs=[
            pl.BlockSpec((block_b, tn, dv), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, M, dv), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, M, dv), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, M), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, tn, dv), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((block_b, tn, dv), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, M, dv), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, M, dv), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        compiler_params=pltpu.CompilerParams(
            # query tiles accumulate into dk/dv → sequential second axis
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
    )(qp, kp, vp, maskp, gp)
    return dq[:B, :N], dk[:B], dv_[:B]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def _fused_mha(q, k, v, mask, num_heads, scale, block_b, tile_n, form):
    interpret = jax.default_backend() != "tpu"
    return _mha_fwd_impl(q, k, v, mask, num_heads, scale, block_b, tile_n,
                         interpret, form)


def _fused_mha_fwd(q, k, v, mask, num_heads, scale, block_b, tile_n, form):
    out = _fused_mha(q, k, v, mask, num_heads, scale, block_b, tile_n, form)
    return out, (q, k, v, mask)


def _fused_mha_bwd(num_heads, scale, block_b, tile_n, form, res, g):
    q, k, v, mask = res
    interpret = jax.default_backend() != "tpu"
    dq, dk, dv = _mha_bwd_impl(q, k, v, mask, g.astype(jnp.float32),
                               num_heads, scale, block_b, tile_n, interpret,
                               form)
    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
            jnp.zeros_like(mask))


_fused_mha.defvjp(_fused_mha_fwd, _fused_mha_bwd)


def fused_mha(
    q: Array,
    k: Array,
    v: Array,
    mask: Optional[Array],
    num_heads: int,
    scale: float,
    block_b: int = 8,
    tile_n: int = 256,
    form: str = "bd_q",
) -> Array:
    """``softmax(q·kᵀ·scale, key_mask)·v`` with feature-split heads.
    Differentiable (custom VJP with a Pallas backward kernel).

    Args:
      q: ``[B, N, dv]`` projected queries.
      k/v: ``[B, M, dv]`` projected keys/values.
      mask: ``[B, M]`` bool key mask or None.
      num_heads: head count (``dv % num_heads == 0``).
      scale: logits scale (reference: ``1/sqrt(dv)``).
      block_b: samples per grid step.  tile_n: query rows per grid step.
      form: attend geometry — ``"bd_q"`` block-diagonalizes the queries
        (original layout), ``"bd_kv"`` block-diagonalizes keys/values (the
        fused-ST v7 geometry: fewer/wider softmax rows, av lands directly
        head-concatenated — wins when M ≪ N, e.g. ISAB's MAB1).  ``"auto"``
        picks bd_kv when ``h·M ≤ N`` (the logits tensor doesn't grow and
        the row count shrinks ≥ h×).

    Returns ``[B, N, dv]`` (heads re-concatenated), f32.
    """
    B, M = q.shape[0], k.shape[1]
    if form == "auto":
        form = "bd_kv" if num_heads * M <= q.shape[1] else "bd_q"
    if mask is None:
        maskf = jnp.ones((B, M), jnp.float32)
    else:
        maskf = mask.astype(jnp.float32)
    tile_n = min(tile_n, q.shape[1]) if q.shape[1] % tile_n else tile_n
    return _fused_mha(q.astype(jnp.float32), k.astype(jnp.float32),
                      v.astype(jnp.float32), maskf,
                      num_heads, scale, block_b, tile_n, form)
