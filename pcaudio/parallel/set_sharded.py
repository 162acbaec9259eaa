"""Set-axis (context-parallel analogue) sharded Set-Transformer forward with
EXPLICIT collectives.

The reference's only answer to large point sets is ISAB's O(N·m) attention
plus input subsampling (``set_transformer-master/modules.py:43-53``,
SURVEY.md §5).  On TPU the same structure makes sharding the point dimension
natural: only the ``m`` inducing / seed vectors ever need cross-shard
communication.  This module implements the whole ``ST`` forward
(``Code/models.py:23-44``) under ``shard_map`` with the point axis sharded
over the mesh's ``set`` axis and hand-placed collectives:

  * **MAB0 / PMA** (shared queries attend over the sharded set): the
    softmax is decomposed shard-locally into (max, numerator, denominator)
    — an online-softmax split — and combined with ``pmax`` + two ``psum``s
    over the ``set`` axis.  That is the ONLY communication: 2·m·dv + m
    floats per sample per ISAB, riding ICI.
  * **MAB1** (points attend back over the m summaries): purely local —
    the summaries are replicated after the psum.
  * rFF / projections / final dense: pointwise, local.

Math is exactly the reference MAB (scale 1/√dim_V, projected-Q residual,
single-ReLU rFF, masked rows → zeros), so the sharded forward equals the
unsharded :class:`pcaudio.nn.ST` to f32 tolerance — asserted by
``tests/test_set_sharded.py`` on the 8-virtual-device CPU mesh.

This is the explicit-collectives alternative to GSPMD auto-partitioning
(``pcaudio.parallel.batch_sharding(shard_set_axis=True)``): same result,
but the communication schedule is fixed by construction, not by the
partitioner's cost model.
"""
from __future__ import annotations

import math
from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from pcaudio.parallel.mesh import DATA_AXIS, SET_AXIS

Array = jax.Array


def _dense(p, x):
    return x @ p["kernel"] + p["bias"]


def _heads(x: Array, h: int) -> Array:
    """[..., N, dv] → [..., h, N, dh] feature-split heads (reference
    ``split(dim_split, 2)`` layout, ``modules.py:23-26``)."""
    *lead, N, dv = x.shape
    return x.reshape(*lead, N, h, dv // h).swapaxes(-3, -2)


def _merge_heads(x: Array) -> Array:
    *lead, h, N, dh = x.shape
    return x.swapaxes(-3, -2).reshape(*lead, N, h * dh)


def _mab_sharded_keys(pm, Q: Array, K_shard: Array,
                      mask_shard: Optional[Array], h: int,
                      axis: str) -> Array:
    """MAB(Q, K) where K (and its mask) are sharded over ``axis``.

    Q ``[B, m, dq]`` replicated; K_shard ``[B, n_loc, dk]``.
    Returns ``[B, m, dv]`` replicated across the axis.
    """
    q = _dense(pm["fc_q"], Q)
    k = _dense(pm["fc_k"], K_shard)
    v = _dense(pm["fc_v"], K_shard)
    dv = q.shape[-1]
    scale = 1.0 / math.sqrt(dv)
    qh, kh, vh = _heads(q, h), _heads(k, h), _heads(v, h)
    lg = jnp.einsum("bhmd,bhnd->bhmn", qh, kh) * scale     # [B,h,m,n_loc]
    if mask_shard is not None:
        neg = jnp.finfo(lg.dtype).min
        lg = jnp.where(mask_shard[:, None, None, :], lg, neg)
    # online-softmax split across shards: local max → pmax, then the
    # shifted numerator/denominator → psum
    # stop_gradient BEFORE the collective: pmax has no differentiation rule,
    # and the max-shift is a gradient-free stabilizer anyway
    mx_loc = jax.lax.stop_gradient(jnp.max(lg, axis=-1, keepdims=True))
    mx = jax.lax.pmax(mx_loc, axis)
    p = jnp.exp(lg - mx)
    if mask_shard is not None:
        p = p * mask_shard[:, None, None, :]
    num = jax.lax.psum(jnp.einsum("bhmn,bhnd->bhmd", p, vh), axis)
    den = jax.lax.psum(jnp.sum(p, axis=-1, keepdims=True), axis)
    att = num / jnp.maximum(den, jnp.finfo(num.dtype).tiny)
    o = q + _merge_heads(att)                              # Q̂ residual
    return o + jax.nn.relu(_dense(pm["fc_o"], o))


def _mab_local(pm, Q_shard: Array, K_rep: Array, h: int) -> Array:
    """MAB(Q, K) with Q sharded and K replicated — no communication."""
    q = _dense(pm["fc_q"], Q_shard)
    k = _dense(pm["fc_k"], K_rep)
    v = _dense(pm["fc_v"], K_rep)
    dv = q.shape[-1]
    scale = 1.0 / math.sqrt(dv)
    qh, kh, vh = _heads(q, h), _heads(k, h), _heads(v, h)
    lg = jnp.einsum("bhnd,bhmd->bhnm", qh, kh) * scale
    att = jax.nn.softmax(lg, axis=-1)
    o = q + _merge_heads(jnp.einsum("bhnm,bhmd->bhnd", att, vh))
    return o + jax.nn.relu(_dense(pm["fc_o"], o))


def _st_forward_shard(p, points, mask, *, num_heads: int, axis: str):
    """Per-shard ST forward: points/mask hold this shard's slice of the
    point axis; returns replicated clip logits."""
    B = points.shape[0]
    x = points
    for name in ("enc_0", "enc_1"):
        ip = p[name]
        I = jnp.broadcast_to(ip["I"], (B,) + ip["I"].shape[1:])
        H = _mab_sharded_keys(ip["mab0"], I, x, mask, num_heads, axis)
        x = _mab_local(ip["mab1"], x, H, num_heads)
    pp = p["dec_pma"]
    S = jnp.broadcast_to(pp["S"], (B,) + pp["S"].shape[1:])
    out = _mab_sharded_keys(pp["mab"], S, x, mask, num_heads, axis)
    logits = _dense(p["dec_out"], out)                     # [B, k_seeds, ncls]
    return logits.squeeze(1)


def set_sharded_st_forward(
    params: Any,
    points: Array,
    mask: Optional[Array],
    mesh: Mesh,
    *,
    num_heads: int,
) -> Array:
    """ST forward with the point axis sharded over the mesh ``set`` axis
    (and the batch over ``data``), explicit psum/pmax collectives.

    ``points [B, N, d]`` with ``N`` divisible by the set-axis size;
    ``mask [B, N]`` bool or None.  Returns logits ``[B, ncls]``.
    """
    p = params["params"] if "params" in params else params
    if mask is None:
        mask = jnp.ones(points.shape[:2], bool)
    fn = shard_map(
        partial(_st_forward_shard, num_heads=num_heads, axis=SET_AXIS),
        mesh=mesh,
        in_specs=(P(), P(DATA_AXIS, SET_AXIS, None), P(DATA_AXIS, SET_AXIS)),
        out_specs=P(DATA_AXIS),
        check_rep=False,
    )
    return fn(p, points, mask)
