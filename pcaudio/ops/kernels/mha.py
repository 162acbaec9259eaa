"""Fused masked multi-head set-attention Pallas kernel.

The XLA path materializes the per-head logits tensor ``[B, h, N, M]`` in HBM
(~3 GB per MAB at serving batch sizes) and re-reads it for softmax and A·V —
measured HBM-bound at ~100 GB traffic per ST forward on v5e.  This kernel
computes ``softmax(Q·Kᵀ/√dv + mask)·V`` entirely in VMEM, one block of
samples per grid step: the logits tile never leaves the chip.

Set sizes here are small (M ≤ 5120, typically 64-1024), so the whole K/V of a
sample fits in VMEM and no online-softmax tiling is needed — this is the
"small-set" regime of the flash-attention design space.

Semantics exactly match :func:`pcaudio.nn.attention.masked_softmax` +
reference MAB math (``set_transformer-master/modules.py:19-29``): scale
``1/√dim_V`` (not per-head), key-mask → −0.7·f32max before softmax,
all-masked rows produce zeros.

Differentiation: use the XLA path for training; this kernel is forward-only
(serving / eval), selected via ``MAB(fused_attn=True)``.
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


def _mha_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, num_heads, scale,
                block_b):
    dv = q_ref.shape[-1]
    dh = dv // num_heads
    for s in range(block_b):
        qs = q_ref[s]          # [N, dv]
        ks = k_ref[s]          # [M, dv]
        vs = v_ref[s]          # [M, dv]
        m = mask_ref[s]        # [M] (float: 1 valid, 0 pad)
        bias = jnp.where(m > 0, 0.0, _MASK_VALUE)[None, :]  # [1, M]
        outs = []
        for h in range(num_heads):
            sl = slice(h * dh, (h + 1) * dh)
            logits = jax.lax.dot_general(
                qs[:, sl], ks[:, sl],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale + bias                               # [N, M]
            mx = jnp.max(logits, axis=-1, keepdims=True)
            p = jnp.exp(logits - mx) * (m[None, :] > 0)
            denom = jnp.sum(p, axis=-1, keepdims=True)
            p = p * jnp.where(denom == 0.0, 0.0, 1.0 / jnp.where(denom == 0.0, 1.0, denom))
            outs.append(
                jax.lax.dot_general(
                    p.astype(vs.dtype), vs[:, sl],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            )                                              # [N, dh]
        o_ref[s] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)


def fused_mha(
    q: Array,
    k: Array,
    v: Array,
    mask: Optional[Array],
    num_heads: int,
    scale: float,
    block_b: int = 8,
) -> Array:
    """``softmax(q·kᵀ·scale, key_mask)·v`` with feature-split heads.

    Args:
      q: ``[B, N, dv]`` projected queries.
      k/v: ``[B, M, dv]`` projected keys/values.
      mask: ``[B, M]`` bool key mask or None.
      num_heads: head count (``dv % num_heads == 0``).
      scale: logits scale (reference: ``1/sqrt(dv)``).

    Returns ``[B, N, dv]`` (heads re-concatenated), f32.
    """
    B, N, dv = q.shape
    M = k.shape[1]
    if mask is None:
        mask = jnp.ones((B, M), jnp.float32)
    else:
        mask = mask.astype(jnp.float32)

    pad_b = (-B) % block_b
    if pad_b:
        q = jnp.pad(q, ((0, pad_b), (0, 0), (0, 0)))
        k = jnp.pad(k, ((0, pad_b), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, pad_b), (0, 0), (0, 0)))
        mask = jnp.pad(mask, ((0, pad_b), (0, 0)), constant_values=1.0)
    Bp = B + pad_b

    kernel = functools.partial(
        _mha_kernel, num_heads=num_heads, scale=scale, block_b=block_b
    )
    # Mosaic compiles only on TPU; CPU (tests, virtual meshes) interprets.
    interpret = jax.default_backend() != "tpu"
    out = pl.pallas_call(
        kernel,
        interpret=interpret,
        out_shape=jax.ShapeDtypeStruct((Bp, N, dv), jnp.float32),
        grid=(Bp // block_b,),
        in_specs=[
            pl.BlockSpec((block_b, N, dv), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, M, dv), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, M, dv), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, M), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_b, N, dv), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
    )(q, k, v, mask)
    return out[:B]
