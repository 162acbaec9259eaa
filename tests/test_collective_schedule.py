"""Pin the multi-chip communication schedule (SURVEY.md §2.3's
DataParallel-replacement contract).

The set-sharded ST's collectives are fixed by construction (2 psum + 1 pmax
per sharded-keys MAB — ``pcaudio/parallel/set_sharded.py``): 3 such MABs
(enc_0.mab0, enc_1.mab0, dec_pma.mab) → exactly 6 add-all-reduces and
3 max-all-reduces, and NOTHING else (no all-gather, no all-to-all, no
collective-permute).  The DP serving pipeline must compile with ZERO
collectives — every clip's work is device-local.  These tests fail the
moment a partitioner change or a refactor sneaks extra communication into
either path.
"""
import re

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pcaudio.nn import ST
from pcaudio.parallel import batch_sharding, make_mesh
from pcaudio.parallel.set_sharded import set_sharded_st_forward

# match the op INVOCATION only (opcode directly followed by its operand
# paren) — result names like ``%all-reduce.1 = `` and operand references in
# ``get-tuple-element(%all-reduce)`` must not count
_COLLECTIVE_RE = re.compile(
    r"\b(all_reduce|all_gather|all_to_all|collective_permute|"
    r"reduce_scatter|collective_broadcast)\"?\(")


def _collectives(hlo_text):
    """Count collective ops per kind in HLO/StableHLO text (module text is
    one op per line for both dialects)."""
    counts = {}
    for line in hlo_text.splitlines():
        if "=" not in line:
            continue
        m = _COLLECTIVE_RE.search(line.replace("-", "_"))
        if m:
            counts[m.group(1)] = counts.get(m.group(1), 0) + 1
    return counts


def _reduction_kinds(hlo_text):
    """Split all-reduces by reducer (add vs max) in StableHLO text: each
    ``stablehlo.all_reduce`` op carries its reduction body inline."""
    adds = maxes = 0
    for block in re.split(r"(?=stablehlo\.all_reduce)", hlo_text):
        if not block.startswith("stablehlo.all_reduce"):
            continue
        body = block[: block.find("stablehlo.return")]
        if "stablehlo.maximum" in body:
            maxes += 1
        elif "stablehlo.add" in body:
            adds += 1
    return adds, maxes


def _sharded_forward_text(n_data=2, n_set=4, opt=False):
    mesh = make_mesh(n_data=n_data, n_set=n_set)
    model = ST(dim_input=3, num_outputs=1, dim_output=10, num_inds=8,
               dim_hidden=16, num_heads=4)
    params = model.init(jax.random.key(0), jnp.zeros((1, 8, 3)))
    pts = jnp.zeros((4, 32, 3), jnp.float32)
    mask = jnp.ones((4, 32), bool)
    fn = jax.jit(lambda p, x, m: set_sharded_st_forward(
        p, x, m, mesh, num_heads=4))
    lowered = fn.lower(params, pts, mask)
    if opt:
        return lowered.compile().as_text()
    return lowered.as_text()


def test_set_sharded_collective_schedule():
    """Exactly 2 psum + 1 pmax per sharded-keys MAB, 3 MABs — and no other
    collective kind anywhere in the program."""
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    text = _sharded_forward_text()
    counts = _collectives(text)
    assert set(counts) == {"all_reduce"}, counts
    assert counts["all_reduce"] == 9, counts
    adds, maxes = _reduction_kinds(text)
    assert (adds, maxes) == (6, 3)


def test_set_sharded_compiled_no_gathers():
    """Post-optimization: XLA may merge/schedule the all-reduces, but must
    not introduce gathers or permutes (the set shards never materialize)."""
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    counts = _collectives(_sharded_forward_text(opt=True))
    bad = set(counts) - {"all_reduce", "reduce_scatter"}
    assert not bad, counts
    # merging can only reduce the count; anything above 9 means duplicated
    # communication crept in
    assert counts.get("all_reduce", 0) <= 9, counts


def test_dp_serving_pipeline_zero_collectives():
    """Pure data-parallel serving must compile with NO cross-device
    communication (the weak-scaling contract — per-chip work is constant, so
    throughput scales with chips by construction).

    The serving DP wrapper is shard_map (bench.py) — load-bearing, not
    style: under raw GSPMD jit, XLA's TopK partitioner all-gathers the
    batch-sharded operand of the exact-extraction ``lax.top_k`` (verified on
    this mesh: 2 x f32[B,...] all-gathers), which would serialize serving
    scale-out."""
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    from jax.sharding import PartitionSpec as P
    try:
        from jax import shard_map
    except ImportError:
        from jax.experimental.shard_map import shard_map

    from pcaudio.eval.pipeline import (
        TemporalPipelineConfig, make_temporal_classifier)

    mesh = make_mesh(n_data=8, n_set=1)
    cfg = TemporalPipelineConfig(
        fs=8000, n_fft=256, num_frames=4, top_k=32,
        featurize="xla", extraction="exact")
    model = ST(dim_input=3, num_outputs=1, dim_output=10, num_inds=8,
               dim_hidden=16, num_heads=4)
    params = model.init(jax.random.key(0), jnp.zeros((1, 8, 3)))
    clf = make_temporal_classifier(model, cfg)

    B, L = 16, 8192
    try:
        smapped = shard_map(clf, mesh=mesh,
                            in_specs=(P(), P("data"), P("data")),
                            out_specs=P("data"), check_vma=False)
    except TypeError:  # older shard_map spells it check_rep
        smapped = shard_map(clf, mesh=mesh,
                            in_specs=(P(), P("data"), P("data")),
                            out_specs=P("data"), check_rep=False)
    fn = jax.jit(smapped)
    waves = jnp.zeros((B, L), jnp.float32)
    lengths = jnp.full((B,), L, jnp.int32)
    text = fn.lower(params, waves, lengths).compile().as_text()
    assert _collectives(text) == {}, _collectives(text)
