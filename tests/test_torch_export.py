"""Export round-trip: flax params -> reference-convention .pth -> reference
torch model produces identical logits."""
import importlib.util
import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pcaudio.checkpoint import (
    baseline_ff_state_dict,
    cnn_classifier_state_dict,
    save_pth,
    st_params,
    st_state_dict,
)
from pcaudio.nn import ST, BaselineFF, CNNClassifier

REF = "/root/reference"
needs_ref = pytest.mark.skipif(not os.path.isdir(REF), reason="no reference")


def _load_ref_models():
    def load(name, path):
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        return mod

    load("ref_modules_ex", os.path.join(REF, "set_transformer-master", "modules.py"))
    sys.path.insert(0, os.path.join(REF, "set_transformer-master"))
    return load("ref_models_ex", os.path.join(REF, "Code", "models.py"))


@needs_ref
def test_st_export_roundtrip(tmp_path):
    import torch

    models = _load_ref_models()
    m = ST(dim_input=2, dim_output=10, num_inds=8, dim_hidden=16, num_heads=4)
    params = m.init(jax.random.key(0), jnp.zeros((1, 8, 2)))
    sd = st_state_dict(params, data_parallel_prefix=True)
    assert all(k.startswith("module.") for k in sd)
    p = str(tmp_path / "st.pth")
    save_pth(sd, p)

    tm = models.ST(dim_input=2, num_outputs=1, dim_output=10, num_inds=8,
                   dim_hidden=16, num_heads=4).eval()
    loaded = torch.load(p, map_location="cpu")
    tm.load_state_dict({k[len("module."):]: v for k, v in loaded.items()})
    x = np.random.default_rng(0).standard_normal((3, 20, 2)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.tensor(x)).numpy()
    got = np.asarray(m.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)
    # and back through our own importer
    reimported = st_params({k[len("module."):]: v.numpy()
                            for k, v in loaded.items()})
    got2 = np.asarray(m.apply(reimported, jnp.asarray(x)))
    np.testing.assert_allclose(got2, got, atol=1e-6)


@needs_ref
def test_fb_cnn_export_roundtrip(tmp_path):
    import torch

    models = _load_ref_models()
    fb = BaselineFF(layer_dims=(64, 32), nclasses=5)
    fbp = fb.init(jax.random.key(0), jnp.zeros((1, 64)))
    tm = models.baseline_ff(layer_dims=[64, 32], nclasses=5).eval()
    tm.load_state_dict({k: torch.tensor(v)
                        for k, v in baseline_ff_state_dict(fbp).items()})
    x = np.random.default_rng(1).standard_normal((4, 64)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.tensor(x)).numpy()
    np.testing.assert_allclose(np.asarray(fb.apply(fbp, jnp.asarray(x))),
                               ref, atol=2e-5, rtol=1e-4)

    cnn = CNNClassifier(Nt=4, Nf=32, layer_dims=(32, 16), nclass=5)
    cp = cnn.init(jax.random.key(0), jnp.zeros((1, 4, 32)))
    tc = models.CNN_classifier(Nt=4, Nf=32, layer_dims=[32, 16], nclass=5).eval()
    tc.load_state_dict({k: torch.tensor(v)
                        for k, v in cnn_classifier_state_dict(cp).items()})
    xg = np.random.default_rng(2).standard_normal((4, 4, 32)).astype(np.float32)
    with torch.no_grad():
        ref = tc(torch.tensor(xg)).numpy()
    np.testing.assert_allclose(np.asarray(cnn.apply(cp, jnp.asarray(xg))),
                               ref, atol=2e-5, rtol=1e-4)
