"""Fully-fused Set Transformer forward: the whole ST model in one Pallas
kernel.  Two kernels live here, each with a caller:

  * **v6** (``_make_kernel_v6``) — the production serving kernel:
    pair-packed on the lane axis, serving fast-softmax, optionally
    mask-free.  Default for ``fused_st_forward``.
  * **v4** (``_make_kernel``) — the masked/guarded-softmax fallback with
    exact max-subtract softmax and fully-masked-cloud zeroing: the
    checkpoint-faithful path used by parity tests and any caller that
    needs per-point masks honored in-kernel (``fast_softmax=False``).

(v5 — batched ``dot_general`` over the sample block — was a measured dead
end: Mosaic lowers batched dots to the same per-sample ops, so it saved
nothing; see docs/PERFORMANCE.md.  Removed.)

Why fused: at serving batch sizes the XLA path is bound by HBM round-trips of
attention intermediates at ~150 GB/s effective (measured on v5e: softmax over
a materialized ``[B·h·N, M]`` tensor alone costs more than all the matmul
FLOPs).  This kernel keeps *every* intermediate of
``ISAB → ISAB → PMA → Dense`` (``Code/models.py:13-44``) in VMEM: HBM traffic
collapses to the input clouds and the output logits.

Why this structure (measured on v5e; docs/PERFORMANCE.md): per-op overhead
~0.1 µs dominates at these tiny model dims (dv=64, m=64, h=8), so the win is
minimizing the *number* of ops per sample, not FLOPs.  The v2 kernel spent
~75 ops per sample — 16 of them MAB1's per-head ``[K,8]×[8,m]`` matmuls.
v4 (2.4x faster, 6.8 → 2.9 µs per 128-pt cloud) restructures:

  * **Symmetric block-diagonal attention.**  MAB0/PMA collapse their
    per-head QKᵀ into one matmul because the inducing/seed queries are
    batch-invariant (block-diagonal ``BD(q̂) [h·m, dv]``, precomputed on
    host).  The same trick applies to MAB1 *per sample*: build
    ``BD(q_s) [h·K, dv]`` in-kernel (head h's row block keeps only its
    feature columns — one VPU mask-multiply), then

        lg  = BD(q_s) · k_sᵀ        one [h·K, dv]×[dv, m] matmul
        a   = row_softmax(lg)        plain row softmax, no head grouping
        av  = a · v_s                one [h·K, m]×[m, dv] matmul
        out = Σ_h (av.reshape(h, K, dv) ⊙ colmask)   head-sum, VPU

    16 small matmuls + 8 softmaxes become 2 dense matmuls + 1 softmax + 2
    VPU masks per sample.
  * **Stage-wise block batching.**  All weight-shared projections and rFFs
    run once per sample-*block* on stacked ``[bb·K, d]`` / ``[bb·m, d]``
    tensors; the per-sample attention stages in between are Python-unrolled
    (a ``fori_loop`` variant measured slower — per-iteration overhead eats
    the savings).

Math is exactly the reference MAB (scale 1/√dim_V, projected-Q residual,
single-ReLU rFF; ``set_transformer-master/modules.py:19-33``) — parity-tested
against the XLA path and the shipped torch checkpoints.  Forward-only
(serving/eval); the training path uses XLA.
"""
from __future__ import annotations

import math
import os
from typing import Any, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def _bd_queries(q_hat: Array, num_heads: int) -> Array:
    """``[m, dv]`` shared projected queries → block-diagonal ``[h·m, dv]``:
    head h's row block keeps only its feature columns.  Pure jnp (traceable
    under jit)."""
    m, dv = q_hat.shape
    h = num_heads
    dh = dv // h
    lane = jax.lax.broadcasted_iota(jnp.int32, (h, 1, dv), 2)
    head = jax.lax.broadcasted_iota(jnp.int32, (h, 1, dv), 0)
    colmask = (lane // dh == head).astype(q_hat.dtype)
    return (q_hat[None] * colmask).reshape(h * m, dv)


def _dense_wb(p, dtype):
    return p["kernel"].astype(dtype), p["bias"].astype(jnp.float32)[None, :]


def _mab_weights(p, dtype):
    """(Wq,bq,Wk,bk,Wv,bv,Wo,bo) from a MAB param dict."""
    wq, bq = _dense_wb(p["fc_q"], dtype)
    wk, bk = _dense_wb(p["fc_k"], dtype)
    wv, bv = _dense_wb(p["fc_v"], dtype)
    wo, bo = _dense_wb(p["fc_o"], dtype)
    return (wq, bq, wk, bk, wv, bv, wo, bo)


def _make_kernel(num_heads: int, dv: int, num_inds: int, din: int,
                 ncls: int, block_b: int, K: int,
                 fast_softmax: bool = False):
    h, m, bb = num_heads, num_inds, block_b
    dh = dv // h
    scale = 1.0 / math.sqrt(dv)

    def colmask():
        # generated in-kernel (a captured constant would need an input slot)
        lane = jax.lax.broadcasted_iota(jnp.int32, (h, 1, dv), 2)
        head = jax.lax.broadcasted_iota(jnp.int32, (h, 1, dv), 0)
        return (lane // dh == head).astype(jnp.float32)

    # kernel-engineering probe: PCAUDIO_ST_PROFILE=nosoftmax|nohead strips a
    # stage (WRONG results, timing only) to attribute kernel time
    _profile = os.environ.get("PCAUDIO_ST_PROFILE", "")

    def softmax_rows(lg, guard):
        if _profile == "nosoftmax":
            return lg * (1.0 / 128.0)
        if fast_softmax:
            # Serving softmax: clamp instead of the max-subtract pass, no
            # zero-denominator guard.  exp(clip(·, ±50)) keeps every row's
            # denominator ≥ M·2e-22 > 0 and cannot overflow; rows whose true
            # logits all sit outside ±50 (never observed with the trained
            # checkpoints; activations are O(10)) would flatten toward
            # uniform.  Fully-masked clouds yield uniform-attention garbage
            # instead of zeros — the serving pipeline drops those chunks via
            # chunk_mask before pooling (eval/pipeline.py), and padded
            # samples are sliced off.  Parity-tested against the exact path.
            p = jnp.exp(jnp.clip(lg, -50.0, 50.0))
            return p / jnp.sum(p, axis=-1, keepdims=True)
        mx = jnp.max(lg, axis=-1, keepdims=True)
        p = jnp.exp(lg - mx)
        if guard:
            p = jnp.where(lg <= _MASK_VALUE * 0.5, 0.0, p)
            denom = jnp.sum(p, axis=-1, keepdims=True)
            return p * jnp.where(denom == 0.0, 0.0,
                                 1.0 / jnp.where(denom == 0.0, 1.0, denom))
        return p / jnp.sum(p, axis=-1, keepdims=True)

    def bd_rows(q):
        """[rows, dv] → block-diagonal [h·rows, dv] (bf16)."""
        rows = q.shape[0]
        if _profile == "nohead":
            return jnp.broadcast_to(q[None].astype(jnp.bfloat16),
                                    (h, rows, dv)).reshape(h * rows, dv)
        return (q[None, :, :] * colmask()).reshape(h * rows, dv).astype(
            jnp.bfloat16)

    def head_sum(av, rows):
        """[h·rows, dv] → [rows, dv]: keep head h's feature block, sum."""
        if _profile == "nohead":
            return av[:rows]
        return jnp.sum(av.reshape(h, rows, dv) * colmask(), axis=0)

    def mab0_attend(iq_bd, iq, k_s, v_s, maskbias_s):
        """Shared-query attention for one sample (ISAB's MAB0 / PMA).

        iq_bd [h·mq, dv] bf16 precomputed BD queries; iq [mq, dv] f32.
        k_s/v_s [K, dv] bf16.  Returns pre-rFF residual o [mq, dv] f32.
        Guarded softmax: a fully-masked cloud yields zeros, not NaN.
        """
        lg = jax.lax.dot_general(
            iq_bd, k_s, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale       # [h·mq, K]
        lg = lg + maskbias_s
        a = softmax_rows(lg, guard=True)
        av = jnp.dot(a.astype(jnp.bfloat16), v_s,
                     preferred_element_type=jnp.float32)       # [h·mq, dv]
        return iq + head_sum(av, iq.shape[0])

    def mab1_attend(q_s, k_s, v_s):
        """Per-sample-query attention (ISAB's MAB1) via the BD(q) trick.

        q_s [K, dv] f32; k_s/v_s [m, dv] bf16.  Returns o [K, dv] f32.
        No mask: masked points' MAB1 outputs are garbage but every consumer
        (next MAB0 / PMA) masks them out again.
        """
        lg = jax.lax.dot_general(
            bd_rows(q_s), k_s, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale        # [h·K, m]
        a = softmax_rows(lg, guard=False)
        av = jnp.dot(a.astype(jnp.bfloat16), v_s,
                     preferred_element_type=jnp.float32)       # [h·K, dv]
        return q_s + head_sum(av, K)

    def rff_block(o, Wo, bo):
        """Block-stacked rFF residual: o + relu(o·Wo + bo)."""
        return o + jnp.maximum(
            jnp.dot(o.astype(jnp.bfloat16), Wo,
                    preferred_element_type=jnp.float32) + bo, 0.0)

    def isab_block(x_blk, maskbias, iq_bd, iq, k0w, k0b, v0w, v0b, o0w, o0b,
                   q1w, q1b, k1w, k1b, v1w, v1b, o1w, o1b):
        """One ISAB over the whole block: x_blk [bb·K, dv_in] bf16 →
        [bb·K, dv] f32."""
        # MAB0 keys/values, block-batched.
        kb = (jnp.dot(x_blk, k0w, preferred_element_type=jnp.float32)
              + k0b).astype(jnp.bfloat16)                      # [bb·K, dv]
        vb = (jnp.dot(x_blk, v0w, preferred_element_type=jnp.float32)
              + v0b).astype(jnp.bfloat16)
        o0 = []
        for s in range(bb):
            sl = slice(s * K, (s + 1) * K)
            o0.append(mab0_attend(iq_bd, iq, kb[sl], vb[sl],
                                  maskbias[s][None, :]))
        H = rff_block(jnp.concatenate(o0, axis=0), o0w, o0b)   # [bb·m, dv]
        # MAB1 projections, block-batched.
        qb = jnp.dot(x_blk, q1w, preferred_element_type=jnp.float32) + q1b
        Hb = H.astype(jnp.bfloat16)
        k1 = (jnp.dot(Hb, k1w, preferred_element_type=jnp.float32)
              + k1b).astype(jnp.bfloat16)                      # [bb·m, dv]
        v1 = (jnp.dot(Hb, v1w, preferred_element_type=jnp.float32)
              + v1b).astype(jnp.bfloat16)
        o1 = []
        for s in range(bb):
            slk = slice(s * K, (s + 1) * K)
            slm = slice(s * m, (s + 1) * m)
            o1.append(mab1_attend(qb[slk], k1[slm], v1[slm]))
        return rff_block(jnp.concatenate(o1, axis=0), o1w, o1b)

    def kernel(points_ref, maskbias_ref,
               i1_bd, i1, k10w, k10b, v10w, v10b, o10w, o10b,
               q11w, q11b, k11w, k11b, v11w, v11b, o11w, o11b,
               i2_bd, i2, k20w, k20b, v20w, v20b, o20w, o20b,
               q21w, q21b, k21w, k21b, v21w, v21b, o21w, o21b,
               s_bd, s_dense, kpw, kpb, vpw, vpb, opw, opb,
               dw, db,
               out_ref):
        x = points_ref[:].reshape(bb * K, din).astype(jnp.bfloat16)
        mb = maskbias_ref[:]
        x1 = isab_block(x, mb, i1_bd[...], i1[...],
                        k10w[...], k10b[...], v10w[...], v10b[...],
                        o10w[...], o10b[...],
                        q11w[...], q11b[...], k11w[...], k11b[...],
                        v11w[...], v11b[...], o11w[...], o11b[...])
        x2 = isab_block(x1.astype(jnp.bfloat16), mb, i2_bd[...], i2[...],
                        k20w[...], k20b[...], v20w[...], v20b[...],
                        o20w[...], o20b[...],
                        q21w[...], q21b[...], k21w[...], k21b[...],
                        v21w[...], v21b[...], o21w[...], o21b[...])
        # PMA over the final clouds, block-batched projections.
        x2b = x2.astype(jnp.bfloat16)
        kp = (jnp.dot(x2b, kpw[...], preferred_element_type=jnp.float32)
              + kpb[...]).astype(jnp.bfloat16)
        vp = (jnp.dot(x2b, vpw[...], preferred_element_type=jnp.float32)
              + vpb[...]).astype(jnp.bfloat16)
        ps = []
        for s in range(bb):
            sl = slice(s * K, (s + 1) * K)
            ps.append(mab0_attend(s_bd[...], s_dense[...], kp[sl], vp[sl],
                                  mb[s][None, :]))
        P = rff_block(jnp.concatenate(ps, axis=0), opw[...], opb[...])
        out_ref[:] = (jnp.dot(P.astype(jnp.bfloat16), dw[...],
                              preferred_element_type=jnp.float32) + db[...])

    return kernel


def _blockdiag2(w: Array) -> Array:
    """[di, do] → [2di, 2do] block-diagonal (two copies)."""
    z = jnp.zeros_like(w)
    return jnp.concatenate(
        [jnp.concatenate([w, z], 1), jnp.concatenate([z, w], 1)], 0)


def _make_kernel_v6(num_heads: int, dv: int, num_inds: int, din: int,
                    ncls: int, block_b: int, K: int,
                    has_mask: bool = True, mab1_form: str = "bd_q"):
    """v6: pair-packed v4.  Two samples ride side-by-side on the lane axis
    (feature dim dv=64 → 2·dv=128), with block-diagonal weights keeping them
    independent.  Measured motivation (scripts/probe_lane_width.py, v5e):
    a [n,64]×[64,64] matmul costs the SAME as [n,128]×[128,128], and even
    64-lane elementwise runs slower per element than 128-lane — v4 wasted
    half the machine on every op.  Cross-sample garbage (sample A's
    attention applied to B's value columns) is produced by the packed A·V
    matmuls and discarded by the (sample, head) column masks in head_sum.
    Always uses the serving fast-softmax (this kernel is serving-only).
    """
    h, m = num_heads, num_inds
    P = block_b // 2
    dh = dv // h
    dv2 = 2 * dv
    scale = 1.0 / math.sqrt(dv)
    _profile = os.environ.get("PCAUDIO_ST_PROFILE", "")

    def colmask2():
        # (sample, head) lane masks: lane ∈ [s·dv + head·dh, s·dv+(head+1)·dh)
        lane = jax.lax.broadcasted_iota(jnp.int32, (2, h, 1, dv2), 3)
        head = jax.lax.broadcasted_iota(jnp.int32, (2, h, 1, dv2), 1)
        sblk = jax.lax.broadcasted_iota(jnp.int32, (2, h, 1, dv2), 0)
        return (lane // dh == sblk * h + head).astype(jnp.float32)

    def softmax_rows(lg):
        if _profile == "nosoftmax":
            return lg * (1.0 / 128.0)
        p = jnp.exp(jnp.clip(lg, -50.0, 50.0))
        return p / jnp.sum(p, axis=-1, keepdims=True)

    def head_sum(av, rows):
        """[2·h·rows, dv2] → [rows, dv2]: per-sample head blocks summed into
        their own column half."""
        if _profile == "nohead":
            return av[:rows].astype(jnp.float32)
        return jnp.sum(av.reshape(2, h, rows, dv2) * colmask2(), axis=(0, 1))

    def bd_rows(q):
        """[rows, dv2] paired queries → block-diagonal [2·h·rows, dv2]."""
        rows = q.shape[0]
        if _profile == "nohead":
            return jnp.broadcast_to(
                q[None].astype(jnp.bfloat16), (2 * h, rows, dv2)).reshape(
                    2 * h * rows, dv2)
        return (q[None, None, :, :] * colmask2()).reshape(
            2 * h * rows, dv2).astype(jnp.bfloat16)

    def pair_bias(mb_p, rows):
        """mb_p [2, K] → [2·rows, K] (sample s's bias on its row block);
        None when the kernel is compiled mask-free (serving: top-K clouds
        are always full, invalid chunks dropped by chunk_mask downstream)."""
        if not has_mask or _profile == "nobias":
            return None
        return jnp.concatenate(
            [jnp.broadcast_to(mb_p[0:1], (rows, K)),
             jnp.broadcast_to(mb_p[1:2], (rows, K))], axis=0)

    def rff_block(o, Wo, bo):
        return o + jnp.maximum(
            jnp.dot(o.astype(jnp.bfloat16), Wo,
                    preferred_element_type=jnp.float32) + bo, 0.0)

    def mab0_attend(iq_bd2, iq2, k_p, v_p, bias):
        """Shared-query attend for one pair: iq_bd2 [2·h·mq, dv2] bf16,
        iq2 [mq, dv2] f32, k_p/v_p [K, dv2] bf16, bias [2·h·mq? no: 2·mq... ]
        bias [2·h·mq rows, K].  → [mq, dv2] f32.

        NOT transposed like mab1_attend: MAB0's logits are already
        full-lane ([2·h·mq, K=128]) and the transposed form measured
        slower (1.72 vs 1.65 µs/chunk — the [K,1]-sliced bias broadcasts
        cost more than the sublane softmax saves)."""
        if _profile == "noattend":
            return iq2 + jnp.sum(v_p.astype(jnp.float32)) * 0.0
        lg = jax.lax.dot_general(
            iq_bd2, k_p, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        if bias is not None:
            lg = lg + bias
        a = softmax_rows(lg)
        av = jnp.dot(a.astype(jnp.bfloat16), v_p,
                     preferred_element_type=jnp.float32)   # [2·h·mq, dv2]
        return iq2 + head_sum(av, iq2.shape[0])

    def mab1_attend(q_p, k_p, v_p):
        """Per-query attend for one pair: q_p [K, dv2] f32,
        k_p/v_p [m, dv2] bf16 → [K, dv2] f32.

        Transposed formulation: logits are built as [m, 2·h·K] so the
        softmax reduces over SUBLANES with all 128+ lanes busy — the
        straight [2·h·K, m=64] layout leaves half of every vector register
        empty (probe_lane_width.py)."""
        if _profile == "noattend":
            return q_p + jnp.sum(k_p.astype(jnp.float32)) * 0.0
        lgT = jax.lax.dot_general(
            k_p, bd_rows(q_p), dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale    # [m, 2·h·K]
        if _profile == "nosoftmax":
            aT = lgT * (1.0 / 128.0)
        else:
            pT = jnp.exp(jnp.clip(lgT, -50.0, 50.0))
            aT = pT / jnp.sum(pT, axis=0, keepdims=True)
        av = jax.lax.dot_general(
            aT.astype(jnp.bfloat16), v_p,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)            # [2·h·K, dv2]
        return q_p + head_sum(av, K)

    # --- v7 MAB1: BD moves from the QUERIES to K/V --------------------
    # Keys/values live on m=64 rows (half of MAB1's query rows), so block-
    # diagonalizing THEM instead of q:
    #   lg  = q_p [K, dv2] · bd(k)ᵀ                      → [K, 2h·m]
    #   av  = exp(lg) · bd(v)                            → [K, dv2]
    # The av contraction runs over (sample, head, m) = 2h·m lanes with the
    # head-concat structure carried by bd(v)'s column blocks — the output
    # lands DIRECTLY in [K, dv2] (v6's [2h·K, dv2] av + 262k-element
    # head-mask/sum per pair disappear; av row count drops 2h·K → K at the
    # same contraction tiling).  The softmax denominator is applied AFTER
    # the contraction on [K, dv2] (8x fewer divides than normalizing
    # [K, 2h·m]): av is linear in the unnormalized weights, and each output
    # column d belongs to exactly one (sample, head) segment, whose
    # denominator rides a constant [2h, dv2] one-hot expand.
    def _mab1_consts():
        s_io = jax.lax.broadcasted_iota(jnp.int32, (2 * h * m, 2 * h), 0)
        g_io = jax.lax.broadcasted_iota(jnp.int32, (2 * h * m, 2 * h), 1)
        ones_blk = (s_io // m == g_io).astype(jnp.bfloat16)
        g2 = jax.lax.broadcasted_iota(jnp.int32, (2 * h, dv2), 0)
        d2 = jax.lax.broadcasted_iota(jnp.int32, (2 * h, dv2), 1)
        expand = (d2 // dh == g2).astype(jnp.bfloat16)
        return ones_blk, expand

    def mab1_attend_v7(q_p, k_p, v_p):
        if _profile == "noattend":
            return q_p + jnp.sum(k_p.astype(jnp.float32)) * 0.0
        kbd = bd_rows(k_p.astype(jnp.float32))             # [2h·m, dv2] bf16
        vbd = bd_rows(v_p.astype(jnp.float32))             # [2h·m, dv2] bf16
        lg = jax.lax.dot_general(
            q_p.astype(jnp.bfloat16), kbd,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale    # [K, 2h·m]
        if _profile == "nosoftmax":
            p = lg * (1.0 / 128.0)
        else:
            p = jnp.exp(jnp.clip(lg, -50.0, 50.0))
        pb = p.astype(jnp.bfloat16)
        ones_blk, expand = _mab1_consts()
        den_seg = jnp.dot(pb, ones_blk,
                          preferred_element_type=jnp.float32)  # [K, 2h]
        av = jnp.dot(pb, vbd,
                     preferred_element_type=jnp.float32)       # [K, dv2]
        den = jnp.dot(den_seg.astype(jnp.bfloat16), expand,
                      preferred_element_type=jnp.float32)      # [K, dv2]
        return q_p + av / den

    def isab_block(x_blk, mb, iq_bd2, iq2, kvq0w, kvq0b, o0w, o0b,
                   kv1w, kv1b, o1w, o1b):
        """x_blk [P·K, 2·din or dv2] bf16 → [P·K, dv2] f32.

        The three x-side projections (fc_k, fc_v and MAB1's fc_q) ride ONE
        [·, 3·dv2] matmul and the two H-side ones (MAB1 fc_k/fc_v) another
        [·, 2·dv2] — fewer weight-load passes and dispatches than six
        [·, dv2] dots; the results are recovered by 128-aligned lane
        slices."""
        f0 = (jnp.dot(x_blk, kvq0w, preferred_element_type=jnp.float32)
              + kvq0b)                                     # [P·K, 3·dv2]
        kb = f0[:, :dv2].astype(jnp.bfloat16)
        vb = f0[:, dv2: 2 * dv2].astype(jnp.bfloat16)
        qb = f0[:, 2 * dv2:]
        o0 = []
        for s in range(P):
            sl = slice(s * K, (s + 1) * K)
            o0.append(mab0_attend(iq_bd2, iq2, kb[sl], vb[sl],
                                  pair_bias(mb[s], h * m)))
        H = rff_block(jnp.concatenate(o0, axis=0), o0w, o0b)  # [P·m, dv2]
        Hb = H.astype(jnp.bfloat16)
        f1 = (jnp.dot(Hb, kv1w, preferred_element_type=jnp.float32)
              + kv1b)                                      # [P·m, 2·dv2]
        k1 = f1[:, :dv2].astype(jnp.bfloat16)
        v1 = f1[:, dv2:].astype(jnp.bfloat16)
        mab1 = mab1_attend_v7 if mab1_form == "bd_kv" else mab1_attend
        o1 = []
        for s in range(P):
            slk = slice(s * K, (s + 1) * K)
            slm = slice(s * m, (s + 1) * m)
            o1.append(mab1(qb[slk], k1[slm], v1[slm]))
        return rff_block(jnp.concatenate(o1, axis=0), o1w, o1b)

    def kernel(points_ref, maskbias_ref,
               i1_bd, i1, kvq10w, kvq10b, o10w, o10b, kv11w, kv11b,
               o11w, o11b,
               i2_bd, i2, kvq20w, kvq20b, o20w, o20b, kv21w, kv21b,
               o21w, o21b,
               s_bd, s_dense, kvpw, kvpb, opw, opb,
               dw, db,
               out_ref):
        if _profile == "copyonly":
            out_ref[:] = jnp.broadcast_to(
                jnp.sum(points_ref[:].astype(jnp.float32), axis=(1, 2)
                        )[:, None], (P, 2 * ncls))
            return
        x = points_ref[:].reshape(P * K, 2 * din).astype(jnp.bfloat16)
        mb = maskbias_ref[:]                               # [P, 2, K]
        if _profile == "projonly":
            y = jnp.dot(x, kvq10w[...], preferred_element_type=jnp.float32)
            out_ref[:] = jnp.broadcast_to(
                jnp.sum(y.reshape(P, K * 6 * dv), axis=1)[:, None],
                (P, 2 * ncls))
            return
        x1 = isab_block(x, mb, i1_bd[...], i1[...],
                        kvq10w[...], kvq10b[...], o10w[...], o10b[...],
                        kv11w[...], kv11b[...], o11w[...], o11b[...])
        x2 = isab_block(x1.astype(jnp.bfloat16), mb, i2_bd[...], i2[...],
                        kvq20w[...], kvq20b[...], o20w[...], o20b[...],
                        kv21w[...], kv21b[...], o21w[...], o21b[...])
        x2b = x2.astype(jnp.bfloat16)
        fp = (jnp.dot(x2b, kvpw[...], preferred_element_type=jnp.float32)
              + kvpb[...])                                 # [P·K, 2·dv2]
        kp = fp[:, :dv2].astype(jnp.bfloat16)
        vp = fp[:, dv2:].astype(jnp.bfloat16)
        # PMA batched over ALL pairs: the seed queries are shared, so one
        # [2h, dv2]×[dv2, P·K] matmul + one block-reshaped softmax replace P
        # unrolled attends (only the tiny a·v dots stay per-pair).
        lg_all = jax.lax.dot_general(
            s_bd[...], kp, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale     # [2h, P·K]
        lg4 = lg_all.reshape(2 * h, P, K)
        if has_mask and _profile != "nobias":
            lg4 = lg4 + mb.transpose(1, 0, 2).reshape(
                2, 1, P, K).repeat(h, axis=1).reshape(2 * h, P, K)
        a4 = softmax_rows(lg4)                              # softmax over K
        a_p = a4.transpose(1, 0, 2)                         # [P, 2h, K] tiny
        av = jax.lax.dot_general(
            a_p.astype(jnp.bfloat16), vp.reshape(P, K, dv2),
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)             # [P, 2h, dv2]
        hs = jnp.sum(av.reshape(P, 2, h, dv2)
                     * colmask2().reshape(1, 2, h, dv2), axis=(1, 2))
        Pp = rff_block(s_dense[...] + hs, opw[...], opb[...])  # [P, dv2]
        out_ref[:] = (jnp.dot(Pp.astype(jnp.bfloat16), dw[...],
                              preferred_element_type=jnp.float32) + db[...])

    return kernel


def _pack_weights_v6(w, num_heads, dv, m, ncls):
    """v4 weight list → pair-packed (block-diagonal) v6 weight list.

    Same-input projections are merged along the output axis so the kernel
    issues ONE matmul per input tensor: per ISAB the x-side fc_k/fc_v and
    MAB1's fc_q become a [·, 3·dv2] operand and the H-side MAB1 fc_k/fc_v
    a [·, 2·dv2] one; PMA's fc_k/fc_v likewise.  Layout per ISAB:
    [iq_bd, iq, kvq0w, kvq0b, o0w, o0b, kv1w, kv1b, o1w, o1b]."""
    out = []
    i = 0

    def bd_pair(q_bd, q):
        # q_bd [h·mq, dv] → [2·h·mq, 2dv]; q [mq, dv] → [mq, 2dv]
        return (_blockdiag2(q_bd.astype(jnp.float32)).astype(q_bd.dtype),
                jnp.concatenate([q, q], axis=1))

    def dense_pair(W, b):
        return (_blockdiag2(W.astype(jnp.float32)).astype(W.dtype),
                jnp.concatenate([b, b], axis=1))

    def merged(pairs):
        """[(W, b), ...] same-input denses → one (W_cat, b_cat)."""
        return (jnp.concatenate([p[0] for p in pairs], axis=1),
                jnp.concatenate([p[1] for p in pairs], axis=1))

    for _ in range(2):  # ISAB denses in w: k0, v0, o0, q1, k1, v1, o1
        out += list(bd_pair(w[i], w[i + 1]))
        d = {name: dense_pair(w[i + j], w[i + j + 1])
             for name, j in (("k0", 2), ("v0", 4), ("o0", 6), ("q1", 8),
                             ("k1", 10), ("v1", 12), ("o1", 14))}
        out += list(merged([d["k0"], d["v0"], d["q1"]]))
        out += list(d["o0"])
        out += list(merged([d["k1"], d["v1"]]))
        out += list(d["o1"])
        i += 16
    out += list(bd_pair(w[i], w[i + 1]))      # PMA seeds
    kp = dense_pair(w[i + 2], w[i + 3])
    vp = dense_pair(w[i + 4], w[i + 5])
    out += list(merged([kp, vp]))
    out += list(dense_pair(w[i + 6], w[i + 7]))  # op
    i += 8
    out += list(dense_pair(w[i], w[i + 1]))   # final dense
    return out


def fused_st_forward(
    params: Any,
    points: Array,
    mask: Optional[Array],
    *,
    num_heads: int,
    block_b: int = 8,
    variant: str = "v6",
    fast_softmax: bool = True,
    interpret: Optional[bool] = None,
) -> Array:
    """ST forward via the fused kernel.

    ``block_b`` — samples per grid step (sublane tiling needs a multiple of
    8).  Measured at serving shapes (5504×128-pt clouds, v5e): 8 → 2.67,
    16 → 2.89, 32 → 3.22 µs/cloud.

    Args:
      params: flax params of :class:`pcaudio.nn.ST` (``num_outputs=1``,
        ``ln=False`` — the shipped-checkpoint configuration).
      points: ``[B, K, din]``; mask: ``[B, K]`` bool or None.

    Returns logits ``[B, ncls]`` (f32).
    """
    p = params["params"] if "params" in params else params
    dtype = jnp.bfloat16
    B, K, din = points.shape

    def isab_weights(ip):
        I = ip["I"][0]                                   # [m, dv]
        _, _, *kv0 = _mab_weights(ip["mab0"], dtype)
        iq = I.astype(jnp.float32) @ ip["mab0"]["fc_q"]["kernel"] + \
            ip["mab0"]["fc_q"]["bias"]                   # [m, dv] projected
        wq1, bq1, wk1, bk1, wv1, bv1, wo1, bo1 = _mab_weights(ip["mab1"], dtype)
        return ([_bd_queries(iq, num_heads).astype(dtype),
                 iq.astype(jnp.float32)] + kv0
                + [wq1, bq1, wk1, bk1, wv1, bv1, wo1, bo1])

    w = []
    w += isab_weights(p["enc_0"])
    w += isab_weights(p["enc_1"])
    pp = p["dec_pma"]
    S = pp["S"][0]
    sq = S.astype(jnp.float32) @ pp["mab"]["fc_q"]["kernel"] + \
        pp["mab"]["fc_q"]["bias"]                        # [1, dv]
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

    if variant in ("v6", "v7"):
        # pair packing: the output block's sublane dim is the PAIR count, so
        # it must be a multiple of 8 (Mosaic tiling) → block_b multiple of 16.
        # A (pairs=4, 20) out block compiles but runs ~5x slower.
        block_b = max(16, block_b + (-block_b) % 16)
    pad_b = (-B) % block_b
    if pad_b:
        points = jnp.pad(points, ((0, pad_b), (0, 0), (0, 0)))
        maskbias = jnp.pad(maskbias, ((0, pad_b), (0, 0)))
    Bp = B + pad_b

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    vmem = pltpu.CompilerParams(
        dimension_semantics=("parallel",),  # megacore: independent blocks
        # Mosaic's default scoped-VMEM limit is 16MB; the stage-wise block
        # stacks exceed it for block_b > 16 (v5e has 128MB physical).
        vmem_limit_bytes=96 * 1024 * 1024,
    )

    if variant in ("v6", "v7"):
        Pn = Bp // 2
        Pb = block_b // 2
        # pair-pack: samples (p, p + Pn) side-by-side on the lane axis —
        # halves + minor-dim concat (pure slices, no transpose relayout).
        pts_p = jnp.concatenate([points[:Pn], points[Pn:]], axis=-1)
        mb_p = jnp.stack([maskbias[:Pn], maskbias[Pn:]], axis=1)
        w6 = _pack_weights_v6(w, num_heads, dv, m, ncls)
        kernel = _make_kernel_v6(num_heads, dv, m, din, ncls, block_b, K,
                                 has_mask=mask is not None,
                                 mab1_form="bd_kv" if variant == "v7"
                                 else "bd_q")
        out = pl.pallas_call(
            kernel,
            interpret=interpret,
            out_shape=jax.ShapeDtypeStruct((Pn, 2 * ncls), jnp.float32),
            grid=(Pn // Pb,),
            in_specs=[
                pl.BlockSpec((Pb, K, 2 * din), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Pb, 2, K), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ] + [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in w6],
            out_specs=pl.BlockSpec((Pb, 2 * ncls), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            compiler_params=vmem,
        )(pts_p, mb_p, *w6)
        out = jnp.concatenate([out[:, :ncls], out[:, ncls:]], axis=0)
        return out[:B]

    assert variant == "v4", f"unknown fused-ST variant {variant!r}"
    kernel = _make_kernel(num_heads, dv, m, din, ncls, block_b, K,
                          fast_softmax=fast_softmax)

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
        compiler_params=vmem,
    )(points, maskbias, *w)
    return out[:B]
