"""Masked set-attention primitives: MAB / SAB / ISAB / PMA.

TPU-native re-design of the Set Transformer attention blocks (Lee et al.,
ICML'19; reference implementation at
``/root/reference/set_transformer-master/modules.py:6-63``).  The math is kept
exactly faithful to the reference — its quirks are load-bearing for importing
the shipped checkpoints:

  * attention scale is ``1/sqrt(dim_V)`` (the *full* value dim, not the
    per-head dim) — ``modules.py:28``;
  * the residual adds the *projected* query ``Q_`` before the output
    projection — ``modules.py:29``;
  * the feed-forward residual is a single ReLU'd linear, no hidden
    expansion — ``modules.py:31``;
  * optional LayerNorms sit after the attention residual and after the FF
    residual — ``modules.py:30-32`` (all shipped checkpoints use ``ln=False``).

What *is* different from the reference (TPU-first design):

  * heads are a tensor axis contracted with ``einsum`` (one big MXU-friendly
    batched matmul) instead of torch's split+cat-on-batch trick
    (``modules.py:23-26``) — mathematically identical;
  * every block takes an optional boolean *key mask* so fixed-budget padded
    point clouds (see :class:`pcaudio.core.types.PointCloud`) attend only over
    valid points.  With a full mask the outputs equal the reference's unmasked
    math bit-for-bit in f32;
  * an optional ``dtype`` runs the matmuls in bfloat16 on the MXU while
    keeping parameters in float32.
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array


def torch_dense(features: int, fan_in: int, *, name: str, dtype=None):
    """``nn.Dense`` with torch ``nn.Linear``'s DEFAULT initialization:
    kernel ``kaiming_uniform_(a=√5)`` = U(±√(1/fan_in)), bias
    U(±1/√fan_in).  The reference models never set custom inits
    (``modules.py``, ``Code/models.py``), so train-from-scratch parity
    starts from matching this — flax's default (lecun_normal kernel +
    ZERO bias) measured an init CE loss of 55 vs torch's 2.65 on the
    FST recipe (logit scale ~20x), a materially different optimization
    start."""
    bound = 1.0 / math.sqrt(fan_in)
    return nn.Dense(
        features, name=name, dtype=dtype,
        kernel_init=nn.initializers.variance_scaling(
            1.0 / 3.0, "fan_in", "uniform"),
        bias_init=lambda key, shape, bdtype=jnp.float32: jax.random.uniform(
            key, shape, bdtype, -bound, bound),
    )


def masked_softmax(logits: Array, mask: Optional[Array], axis: int = -1) -> Array:
    """Softmax over ``axis`` attending only where ``mask`` is True.

    ``mask`` broadcasts against ``logits``.  Rows whose keys are ALL masked
    return zeros (instead of NaN), which keeps padded queries finite.
    With ``mask=None`` this is exactly ``jax.nn.softmax``.
    """
    if mask is None:
        return jax.nn.softmax(logits, axis=axis)
    neg = jnp.finfo(logits.dtype).min
    masked = jnp.where(mask, logits, neg)
    m = jax.lax.stop_gradient(jnp.max(masked, axis=axis, keepdims=True))
    unnorm = jnp.exp(masked - m) * mask
    denom = jnp.sum(unnorm, axis=axis, keepdims=True)
    return unnorm / jnp.maximum(denom, jnp.finfo(logits.dtype).tiny)


class MAB(nn.Module):
    """Multihead Attention Block: ``MAB(Q, K) = LN(H + rFF(H))``,
    ``H = LN(Q' + Att(Q', K', V'))`` with the reference's exact conventions
    (``modules.py:19-33``).

    Attributes:
      dim_V: output / value dimension (must be divisible by ``num_heads``).
      num_heads: number of attention heads.
      ln: apply LayerNorms (reference default False; all checkpoints False).
      dtype: computation dtype (params stay float32).  None → float32.
    """

    dim_V: int
    num_heads: int
    ln: bool = False
    dtype: Optional[jnp.dtype] = None
    # Pallas attention kernels (fwd + custom-VJP bwd) — trainable
    fused_attn: bool = False

    @nn.compact
    def __call__(self, Q: Array, K: Array, key_mask: Optional[Array] = None) -> Array:
        """Args:
          Q: ``[B, N, dim_Q]`` queries.
          K: ``[B, M, dim_K]`` keys (values are projected from the same K).
          key_mask: optional ``[B, M]`` bool; False keys are not attended to.

        Returns ``[B, N, dim_V]``.
        """
        dv, h = self.dim_V, self.num_heads
        assert dv % h == 0, f"dim_V={dv} not divisible by num_heads={h}"
        dh = dv // h
        dtype = self.dtype or jnp.float32

        q = torch_dense(dv, Q.shape[-1], name="fc_q", dtype=dtype)(Q)
        k = torch_dense(dv, K.shape[-1], name="fc_k", dtype=dtype)(K)
        v = torch_dense(dv, K.shape[-1], name="fc_v", dtype=dtype)(K)

        B, N = q.shape[0], q.shape[1]
        M = k.shape[1]
        scale = 1.0 / math.sqrt(dv)

        if self.fused_attn:
            import os

            from pcaudio.ops.kernels.mha import fused_mha

            # attend geometry: "auto" routes small-key attends (ISAB MAB1)
            # through the bd_kv (fused-ST v7) layout; default stays bd_q
            # until bd_kv is chip-measured faster on the training step
            form = os.environ.get("PCAUDIO_TRAIN_ATTEND_FORM", "bd_q")
            out = fused_mha(q, k, v, key_mask, num_heads=h, scale=scale,
                            form=form)
            out = out.astype(dtype)
        else:
            # Feature-split heads: head i sees features [i*dh:(i+1)*dh],
            # exactly the reference's split(dim_split, 2) layout
            # (modules.py:23-26).
            qh = q.reshape(B, N, h, dh)
            kh = k.reshape(B, M, h, dh)
            vh = v.reshape(B, M, h, dh)
            logits = jnp.einsum(
                "bnhd,bmhd->bhnm", qh, kh, preferred_element_type=jnp.float32
            ) * scale
            mask_b = None if key_mask is None else key_mask[:, None, None, :]
            attn = masked_softmax(logits, mask_b, axis=-1).astype(dtype)
            out = jnp.einsum(
                "bhnm,bmhd->bnhd", attn, vh, preferred_element_type=jnp.float32
            ).astype(dtype).reshape(B, N, dv)

        o = q + out  # residual adds projected Q (modules.py:29)
        if self.ln:
            o = nn.LayerNorm(name="ln0", dtype=dtype)(o)
        o = o + nn.relu(torch_dense(dv, dv, name="fc_o", dtype=dtype)(o))
        if self.ln:
            o = nn.LayerNorm(name="ln1", dtype=dtype)(o)
        return o


class SAB(nn.Module):
    """Self-Attention Block: ``SAB(X) = MAB(X, X)`` (``modules.py:35-41``)."""

    dim_out: int
    num_heads: int
    ln: bool = False
    dtype: Optional[jnp.dtype] = None
    fused_attn: bool = False

    @nn.compact
    def __call__(self, X: Array, mask: Optional[Array] = None) -> Array:
        return MAB(self.dim_out, self.num_heads, self.ln, self.dtype,
                   self.fused_attn, name="mab")(X, X, key_mask=mask)


class ISAB(nn.Module):
    """Induced Set Attention Block (``modules.py:43-53``): O(N·m) attention via
    ``m`` learned inducing points.

      H = MAB0(I, X)    # m inducing points attend over the (masked) set
      out = MAB1(X, H)  # the set attends back over the m summaries

    The set mask applies only to MAB0's keys; H itself is always fully valid.
    """

    dim_out: int
    num_heads: int
    num_inds: int
    ln: bool = False
    dtype: Optional[jnp.dtype] = None
    fused_attn: bool = False

    @nn.compact
    def __call__(self, X: Array, mask: Optional[Array] = None) -> Array:
        I = self.param(
            "I",
            nn.initializers.xavier_uniform(),
            (1, self.num_inds, self.dim_out),
            jnp.float32,
        )
        B = X.shape[0]
        I_b = jnp.broadcast_to(I, (B, self.num_inds, self.dim_out)).astype(
            self.dtype or jnp.float32
        )
        H = MAB(self.dim_out, self.num_heads, self.ln, self.dtype,
                self.fused_attn, name="mab0")(I_b, X, key_mask=mask)
        return MAB(self.dim_out, self.num_heads, self.ln, self.dtype,
                   self.fused_attn, name="mab1")(X, H, key_mask=None)


class PMA(nn.Module):
    """Pooling by Multihead Attention (``modules.py:55-63``): ``k`` learned
    seed vectors attend over the (masked) set, producing ``[B, k, dim]``.
    """

    dim: int
    num_heads: int
    num_seeds: int
    ln: bool = False
    dtype: Optional[jnp.dtype] = None
    fused_attn: bool = False

    @nn.compact
    def __call__(self, X: Array, mask: Optional[Array] = None) -> Array:
        S = self.param(
            "S",
            nn.initializers.xavier_uniform(),
            (1, self.num_seeds, self.dim),
            jnp.float32,
        )
        B = X.shape[0]
        S_b = jnp.broadcast_to(S, (B, self.num_seeds, self.dim)).astype(
            self.dtype or jnp.float32
        )
        return MAB(self.dim, self.num_heads, self.ln, self.dtype,
                   self.fused_attn, name="mab")(S_b, X, key_mask=mask)
