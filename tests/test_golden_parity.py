"""Golden-tensor parity: flax modules vs the PyTorch reference.

Each .npz in tests/golden/ holds a reference module's state_dict, a fixed
random input, and the reference output (generated once by
tests/golden/generate_golden.py).  These tests import the state_dict through
pcaudio.checkpoint.torch_import and assert the flax forward matches.
"""
import os

import numpy as np
import pytest

import jax.numpy as jnp

from pcaudio import checkpoint as ckpt
from pcaudio.nn import (
    MAB, SAB, ISAB, PMA,
    ST, BaselineFF, CNNClassifier, DeepSet, SetTransformer,
)

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")
TOL = dict(atol=2e-5, rtol=2e-5)


def load(name):
    z = np.load(os.path.join(GOLDEN, f"{name}.npz"))
    sd = {k[3:]: z[k] for k in z.files if k.startswith("sd.")}
    inputs = {k[3:]: z[k] for k in z.files if k.startswith("in.")}
    return sd, inputs, z["out"]


@pytest.mark.parametrize("ln", [False, True])
def test_mab(ln):
    sd, inp, ref = load(f"mab_ln{int(ln)}")
    m = MAB(dim_V=8, num_heads=2, ln=ln)
    params = {"params": ckpt.mab_params({f"x.{k}": v for k, v in sd.items()}, "x")}
    out = m.apply(params, jnp.asarray(inp["Q"]), jnp.asarray(inp["K"]))
    np.testing.assert_allclose(np.asarray(out), ref, **TOL)


def test_sab():
    sd, inp, ref = load("sab")
    m = SAB(dim_out=8, num_heads=4)
    params = {"params": ckpt.sab_params({f"x.{k}": v for k, v in sd.items()}, "x")}
    out = m.apply(params, jnp.asarray(inp["X"]))
    np.testing.assert_allclose(np.asarray(out), ref, **TOL)


def test_isab():
    sd, inp, ref = load("isab")
    m = ISAB(dim_out=8, num_heads=2, num_inds=5)
    params = {"params": ckpt.isab_params({f"x.{k}": v for k, v in sd.items()}, "x")}
    out = m.apply(params, jnp.asarray(inp["X"]))
    np.testing.assert_allclose(np.asarray(out), ref, **TOL)


def test_pma():
    sd, inp, ref = load("pma")
    m = PMA(dim=8, num_heads=2, num_seeds=3)
    params = {"params": ckpt.pma_params({f"x.{k}": v for k, v in sd.items()}, "x")}
    out = m.apply(params, jnp.asarray(inp["X"]))
    np.testing.assert_allclose(np.asarray(out), ref, **TOL)


@pytest.mark.parametrize("name,dim_input", [("st_fst", 2), ("st_3st", 3)])
def test_st(name, dim_input):
    sd, inp, ref = load(name)
    m = ST(dim_input=dim_input, num_outputs=1, dim_output=10,
           num_inds=64, dim_hidden=64, num_heads=8)
    params = ckpt.st_params(sd)
    out = m.apply(params, jnp.asarray(inp["X"]))
    np.testing.assert_allclose(np.asarray(out), ref, **TOL)


def test_st_mask_equivalence():
    """Padded+masked forward == exact-size forward (the core TPU-design
    invariant: fixed-budget clouds with masks reproduce reference math)."""
    sd, inp, ref = load("st_fst")
    m = ST(dim_input=2, num_outputs=1, dim_output=10,
           num_inds=64, dim_hidden=64, num_heads=8)
    params = ckpt.st_params(sd)
    X = jnp.asarray(inp["X"])  # [4, 50, 2]
    pad = jnp.pad(X, ((0, 0), (0, 14), (0, 0)), constant_values=123.0)
    mask = jnp.arange(64)[None, :] < 50
    mask = jnp.broadcast_to(mask, (4, 64))
    out = m.apply(params, pad, mask=mask)
    np.testing.assert_allclose(np.asarray(out), ref, **TOL)


def test_baseline_ff():
    sd, inp, ref = load("baseline_ff")
    m = BaselineFF(layer_dims=(1025, 513, 256), nclasses=10)
    params = ckpt.baseline_ff_params(sd, num_hidden=2)
    out = m.apply(params, jnp.asarray(inp["x"]))
    np.testing.assert_allclose(np.asarray(out), ref, **TOL)


def test_cnn_classifier():
    sd, inp, ref = load("cnn_temp")
    m = CNNClassifier(Nt=10, Nf=512, layer_dims=(512, 256, 100), nclass=10)
    params = ckpt.cnn_classifier_params(sd, num_hidden=2)
    out = m.apply(params, jnp.asarray(inp["x"]))
    np.testing.assert_allclose(np.asarray(out), ref, **TOL)


def test_set_transformer():
    sd, inp, ref = load("set_transformer")
    m = SetTransformer(dim_input=3, num_outputs=2, dim_output=5,
                       num_inds=8, dim_hidden=16, num_heads=4)
    params = ckpt.set_transformer_params(sd)
    out = m.apply(params, jnp.asarray(inp["X"]))
    np.testing.assert_allclose(np.asarray(out), ref, **TOL)


def test_deepset():
    sd, inp, ref = load("deepset")
    m = DeepSet(dim_input=3, num_outputs=2, dim_output=5, dim_hidden=16)
    params = ckpt.deepset_params(sd)
    out = m.apply(params, jnp.asarray(inp["X"]))
    np.testing.assert_allclose(np.asarray(out), ref, **TOL)


def test_torch_default_init_statistics():
    """All Dense layers use torch nn.Linear's default init (kernel
    U(±√(1/fan_in)), bias U(±1/√fan_in)) — flax's default (lecun_normal +
    zero bias) started the FST recipe at CE ≈ 55 vs torch's 2.65.
    Asserts bounds and spread per layer, and a sane CE at init."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pcaudio.nn import ST

    model = ST(dim_input=2, num_outputs=1, dim_output=10,
               num_inds=64, dim_hidden=64, num_heads=8)
    params = jax.tree_util.tree_map(
        np.asarray, model.init(jax.random.key(0), jnp.zeros((1, 16, 2))))

    def walk(tree, prefix=""):
        for k, v in tree.items():
            if isinstance(v, dict):
                yield from walk(v, prefix + k + "/")
            else:
                yield prefix + k, v

    checked = 0
    for name, w in walk(params["params"]):
        if name.endswith("kernel"):
            fan_in = w.shape[0]
            bound = (1.0 / fan_in) ** 0.5
            assert np.abs(w).max() <= bound + 1e-6, name
            # uniform(±b) has std b/√3; require a real spread
            assert w.std() > 0.4 * bound / np.sqrt(3), name
            checked += 1
        elif name.endswith("bias"):
            assert np.abs(w).max() > 0.0, f"{name}: zero-init bias"
    assert checked >= 10

    # CE at init on reference-scale inputs (log-mags ≈ −18..0)
    x = jnp.asarray(
        np.stack([np.linspace(0, 0.5, 1025).astype(np.float32)] * 4)[..., None]
    )
    mags = jnp.asarray(
        -8.0 + np.random.default_rng(0).standard_normal((4, 1025, 1)
                                                        ).astype(np.float32))
    logits = model.apply(params, jnp.concatenate([x, mags], axis=-1))
    ce = float(jnp.mean(
        jax.nn.logsumexp(logits, axis=-1)
        - jnp.take_along_axis(logits, jnp.zeros((4, 1), jnp.int32), 1)[:, 0]))
    assert ce < 6.0, f"init CE {ce} — init scale off"
