"""Fused Set Transformer forward, v3: block-batched kernel.

Refinement of :mod:`pcaudio.ops.kernels.fused_st` using two measured facts
(v5e): per-sample VPU work (bias adds, softmax, residuals) serializes with
the MXU, and weight-shared matmuls can batch a whole sample block in one op.
v3 therefore lifts everything weight-shared to block level:

  * all q/k/v projections and rFFs run on ``[bb·K, d]`` / ``[bb·m, d]``
    stacks — one matmul per block instead of per sample;
  * MAB0/PMA logits for the whole block are ONE matmul
    ``BD(q̂) [h·m, dv] × K_block [bb·K, dv]ᵀ`` (inducing/seed queries are
    batch-invariant), with a segmented softmax ``[h·m, bb, K]``;
  * only the A·V products and MAB1's per-head QKᵀ remain per-sample
    (measured ~0.1 µs each, chained).

Math identical to the reference MAB (``modules.py:19-33``); parity-tested
against the XLA path (CPU interpret mode).  Forward-only.

STATUS: experimental, measured SLOWER than v2 (45.9 vs 39.0 ms at
5504x128-pt clouds on v5e): the fori_loop per-iteration overhead plus the
8x-FLOP block-diagonal logits matmul eat the savings from block-level
projections.  v2 (:func:`pcaudio.ops.kernels.fused_st.fused_st_forward`)
remains the production serving kernel.  Kept as the starting point for a
two-level-grid variant (kernel-internal pipelining over samples) next round.
"""
from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pcaudio.ops.kernels.fused_st import (  # shared helpers
    _MASK_VALUE,
    _bd_queries,
    _dense_wb,
    _mab_weights,
)

Array = jax.Array


def _make_kernel_v3(num_heads: int, dv: int, num_inds: int, ncls: int,
                    block_b: int, K: int):
    h, m, bb = num_heads, num_inds, block_b
    dh = dv // h
    scale = 1.0 / math.sqrt(dv)

    def colmask(rows):
        lane = jax.lax.broadcasted_iota(jnp.int32, (h, rows, dv), 2)
        head = jax.lax.broadcasted_iota(jnp.int32, (h, rows, dv), 0)
        return (lane // dh == head).astype(jnp.float32)

    def seg_softmax_guarded(lg3):
        """softmax over the last axis of [h*m, bb, K] with all-masked guard."""
        mx = jnp.max(lg3, axis=-1, keepdims=True)
        p = jnp.exp(lg3 - mx)
        p = jnp.where(lg3 <= _MASK_VALUE * 0.5, 0.0, p)
        d = jnp.sum(p, axis=-1, keepdims=True)
        return p * jnp.where(d == 0.0, 0.0, 1.0 / jnp.where(d == 0.0, 1.0, d))

    def isab(x2d, mb, iq_bd, iq, Wk0, bk0, Wv0, bv0, Wo0, bo0,
             Wq1, bq1, Wk1, bk1, Wv1, bv1, Wo1, bo1, h_scratch, o_scratch):
        """x2d [bb*K, din] bf16 → o_scratch [bb*K, dv] f32 (also returned)."""
        kb = jnp.dot(x2d, Wk0, preferred_element_type=jnp.float32) + bk0
        vb = (jnp.dot(x2d, Wv0, preferred_element_type=jnp.float32)
              + bv0).astype(jnp.bfloat16)                     # [bb*K, dv]
        lg = jax.lax.dot_general(
            iq_bd, kb.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale                                              # [h*m, bb*K]
        a = seg_softmax_guarded(lg.reshape(h * m, bb, K) + mb[None])
        a2 = a.reshape(h * m, bb * K).astype(jnp.bfloat16)
        cm_m = colmask(m)
        for s in range(bb):
            av = jnp.dot(a2[:, s * K:(s + 1) * K], vb[s * K:(s + 1) * K, :],
                         preferred_element_type=jnp.float32)   # [h*m, dv]
            sel = jnp.sum(av.reshape(h, m, dv) * cm_m, axis=0)
            h_scratch[s * m:(s + 1) * m, :] = iq + sel
        Hb = h_scratch[...]
        Hb = Hb + jnp.maximum(
            jnp.dot(Hb.astype(jnp.bfloat16), Wo0,
                    preferred_element_type=jnp.float32) + bo0, 0.0)
        Hbf = Hb.astype(jnp.bfloat16)                          # [bb*m, dv]

        qb = jnp.dot(x2d, Wq1, preferred_element_type=jnp.float32) + bq1
        k1 = (jnp.dot(Hbf, Wk1, preferred_element_type=jnp.float32)
              + bk1).astype(jnp.bfloat16)                      # [bb*m, dv]
        v1 = (jnp.dot(Hbf, Wv1, preferred_element_type=jnp.float32)
              + bv1).astype(jnp.bfloat16)
        qbf = qb.astype(jnp.bfloat16)
        for s in range(bb):
            qs = qbf[s * K:(s + 1) * K]                        # [K, dv]
            ks = k1[s * m:(s + 1) * m]                         # [m, dv]
            vs = v1[s * m:(s + 1) * m]
            outs = []
            for i in range(h):
                sl = slice(i * dh, (i + 1) * dh)
                lg1 = jax.lax.dot_general(
                    qs[:, sl], ks[:, sl],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) * scale                                      # [K, m]
                mx = jnp.max(lg1, axis=-1, keepdims=True)
                p = jnp.exp(lg1 - mx)
                p = p / jnp.sum(p, axis=-1, keepdims=True)
                outs.append(jnp.dot(p.astype(jnp.bfloat16), vs[:, sl],
                                    preferred_element_type=jnp.float32))
            o_scratch[s * K:(s + 1) * K, :] = (
                qb[s * K:(s + 1) * K] + jnp.concatenate(outs, axis=-1))
        ob = o_scratch[...]
        ob = ob + jnp.maximum(
            jnp.dot(ob.astype(jnp.bfloat16), Wo1,
                    preferred_element_type=jnp.float32) + bo1, 0.0)
        return ob                                              # [bb*K, dv] f32

    def kernel(points_ref, maskbias_ref,
               i1_bd, i1, k10w, k10b, v10w, v10b, o10w, o10b,
               q11w, q11b, k11w, k11b, v11w, v11b, o11w, o11b,
               i2_bd, i2, k20w, k20b, v20w, v20b, o20w, o20b,
               q21w, q21b, k21w, k21b, v21w, v21b, o21w, o21b,
               s_bd, s_dense, kpw, kpb, vpw, vpb, opw, opb,
               dw, db,
               out_ref, h_scratch, o_scratch, o_scratch2, p_scratch):
        x2d = points_ref[...].reshape(bb * K, -1).astype(jnp.bfloat16)
        mb = maskbias_ref[...]                                  # [bb, K]
        x1 = isab(x2d, mb, i1_bd[...], i1[...],
                  k10w[...], k10b[...], v10w[...], v10b[...],
                  o10w[...], o10b[...],
                  q11w[...], q11b[...], k11w[...], k11b[...],
                  v11w[...], v11b[...], o11w[...], o11b[...],
                  h_scratch, o_scratch)
        x2 = isab(x1.astype(jnp.bfloat16), mb, i2_bd[...], i2[...],
                  k20w[...], k20b[...], v20w[...], v20b[...],
                  o20w[...], o20b[...],
                  q21w[...], q21b[...], k21w[...], k21b[...],
                  v21w[...], v21b[...], o21w[...], o21b[...],
                  h_scratch, o_scratch2)
        # PMA: 1 seed; block-batched logits like mab0
        x2b = x2.astype(jnp.bfloat16)
        kp = jnp.dot(x2b, kpw[...], preferred_element_type=jnp.float32) + kpb[...]
        vp = (jnp.dot(x2b, vpw[...], preferred_element_type=jnp.float32)
              + vpb[...]).astype(jnp.bfloat16)
        lg = jax.lax.dot_general(
            s_bd[...], kp.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale                                               # [h, bb*K]
        a = seg_softmax_guarded(lg.reshape(h, bb, K) + mb[None])
        a2 = a.reshape(h, bb * K).astype(jnp.bfloat16)
        cm1 = colmask(1)
        for s in range(bb):
            av = jnp.dot(a2[:, s * K:(s + 1) * K], vp[s * K:(s + 1) * K, :],
                         preferred_element_type=jnp.float32)    # [h, dv]
            sel = jnp.sum(av.reshape(h, 1, dv) * cm1, axis=0)   # [1, dv]
            p_scratch[s:s + 1, :] = s_dense[...] + sel
        P = p_scratch[...]                                      # [bb, dv]
        P = P + jnp.maximum(
            jnp.dot(P.astype(jnp.bfloat16), opw[...],
                    preferred_element_type=jnp.float32) + opb[...], 0.0)
        out_ref[...] = (jnp.dot(P.astype(jnp.bfloat16), dw[...],
                                preferred_element_type=jnp.float32)
                        + db[...])

    return kernel


def fused_st_forward_v3(
    params: Any,
    points: Array,
    mask: Optional[Array],
    *,
    num_heads: int,
    block_b: int = 16,
    interpret: Optional[bool] = None,
) -> Array:
    """Same contract as :func:`pcaudio.ops.kernels.fused_st.fused_st_forward`."""
    p = params["params"] if "params" in params else params
    dtype = jnp.bfloat16
    B, K, din = points.shape

    def isab_weights(ip):
        I = ip["I"][0]
        _, _, *kv0 = _mab_weights(ip["mab0"], dtype)
        iq = I.astype(jnp.float32) @ ip["mab0"]["fc_q"]["kernel"] + \
            ip["mab0"]["fc_q"]["bias"]
        wq1, bq1, wk1, bk1, wv1, bv1, wo1, bo1 = _mab_weights(ip["mab1"], dtype)
        return ([_bd_queries(iq, num_heads).astype(dtype),
                 iq.astype(jnp.float32)] + kv0
                + [wq1, bq1, wk1, bk1, wv1, bv1, wo1, bo1])

    w = []
    w += isab_weights(p["enc_0"])
    w += isab_weights(p["enc_1"])
    pp = p["dec_pma"]
    sq = pp["S"][0].astype(jnp.float32) @ pp["mab"]["fc_q"]["kernel"] + \
        pp["mab"]["fc_q"]["bias"]
    _, _, *kvp = _mab_weights(pp["mab"], dtype)
    w += [_bd_queries(sq, num_heads).astype(dtype),
          sq.astype(jnp.float32)] + kvp
    dw, db = _dense_wb(p["dec_out"], dtype)
    w += [dw, db]

    dv = p["enc_0"]["mab0"]["fc_q"]["kernel"].shape[1]
    m = p["enc_0"]["I"].shape[1]
    ncls = dw.shape[1]

    if mask is None:
        maskbias = jnp.zeros((B, K), jnp.float32)
    else:
        maskbias = jnp.where(mask, 0.0, _MASK_VALUE).astype(jnp.float32)

    pad_b = (-B) % block_b
    if pad_b:
        points = jnp.pad(points, ((0, pad_b), (0, 0), (0, 0)))
        maskbias = jnp.pad(maskbias, ((0, pad_b), (0, 0)))
    Bp = B + pad_b

    kernel = _make_kernel_v3(num_heads, dv, m, ncls, block_b, K)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    out = pl.pallas_call(
        kernel,
        interpret=interpret,
        out_shape=jax.ShapeDtypeStruct((Bp, ncls), jnp.float32),
        grid=(Bp // block_b,),
        in_specs=[
            pl.BlockSpec((block_b, K, din), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, K), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in w],
        out_specs=pl.BlockSpec((block_b, ncls), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((block_b * m, dv), jnp.float32),
            pltpu.VMEM((block_b * K, dv), jnp.float32),
            pltpu.VMEM((block_b * K, dv), jnp.float32),
            pltpu.VMEM((block_b, dv), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            # block logits [h*m, bb*K] f32 exceed the 16MB default scoped
            # limit at bb>=16; v5e has 128MB physical VMEM
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(points, maskbias, *w)
    return out[:B]
