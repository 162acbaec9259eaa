"""FLOPs calculator: analytic counts cross-checked against XLA's measured
cost analysis, and parameter counts against the shipped configs."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pcaudio.bench import (
    baseline_ff_flops,
    measured_flops,
    pipeline_flops_per_clip,
    st_flops,
)
from pcaudio.nn import ST, BaselineFF
from pcaudio.utils import count_parameters


def test_st_flops_vs_xla():
    n, di, dh, m, cls = 256, 3, 64, 64, 10
    model = ST(dim_input=di, dim_output=cls, num_inds=m, dim_hidden=dh,
               num_heads=8)
    params = model.init(jax.random.key(0), jnp.zeros((1, n, di)))
    x = jnp.zeros((1, n, di))
    got = measured_flops(lambda p, x: model.apply(p, x), params, x)
    if got is None:
        pytest.skip("backend reports no cost analysis")
    analytic = st_flops(n, di, dh, m, cls)
    # XLA counts biases/softmax/etc.; analytic must be within 20%
    assert abs(got - analytic) / analytic < 0.2, (got, analytic)


def test_baseline_flops_vs_xla():
    model = BaselineFF(layer_dims=(1025, 513, 256), nclasses=10)
    params = model.init(jax.random.key(0), jnp.zeros((1, 1025)))
    x = jnp.zeros((1, 1025))
    got = measured_flops(lambda p, x: model.apply(p, x), params, x)
    if got is None:
        pytest.skip("backend reports no cost analysis")
    analytic = baseline_ff_flops([1025, 513, 256], 10)
    assert abs(got - analytic) / analytic < 0.1


def test_param_counts_match_reference_configs():
    # BASELINE.md capacity rows: FST 80,202 / FB 660,492 / 3ST 80,394
    fst = ST(dim_input=2, dim_output=10, num_inds=64, dim_hidden=64, num_heads=8)
    p = fst.init(jax.random.key(0), jnp.zeros((1, 8, 2)))
    assert count_parameters(p, display=False) == 80202
    st3 = ST(dim_input=3, dim_output=10, num_inds=64, dim_hidden=64, num_heads=8)
    p = st3.init(jax.random.key(0), jnp.zeros((1, 8, 3)))
    assert count_parameters(p, display=False) == 80394
    fb = BaselineFF(layer_dims=(1025, 513, 256), nclasses=10)
    p = fb.init(jax.random.key(0), jnp.zeros((1, 1025)))
    assert count_parameters(p, display=False) == 660492


def test_pipeline_flops_structure():
    d = pipeline_flops_per_clip(top_k=256)
    assert d["total"] == d["stft"] + d["model"]
    full = pipeline_flops_per_clip(top_k=None)
    assert full["model"] > d["model"]  # 5120-point clouds cost more than 256
