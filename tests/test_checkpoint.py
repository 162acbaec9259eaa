"""Checkpoint layer: all four shipped reference checkpoints import at logit
parity; config JSON round-trip; orbax save/load/resume."""
import glob
import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pcaudio.core.config import (
    ARCH_3ST,
    ARCH_CNN,
    ARCH_FB,
    ARCH_FST,
    ExperimentConfig,
)
from pcaudio.checkpoint.orbax_io import load_checkpoint, save_checkpoint

REF_SAVES = "/root/reference/Code/model_saves"
needs_reference = pytest.mark.skipif(
    not os.path.isdir(REF_SAVES), reason="reference checkpoints not mounted"
)


def _ref_pair(tag):
    cfgs = sorted(glob.glob(os.path.join(REF_SAVES, f"{tag}(*_config.json")))
    pths = sorted(glob.glob(os.path.join(REF_SAVES, f"{tag}(*_net.pth")))
    return cfgs[-1], pths[-1]


def _torch_forward(tag, cfg: ExperimentConfig, pth, x):
    import importlib.util
    import sys

    import torch

    def load(name, path):
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        return mod

    load("ref_modules_ck", "/root/reference/set_transformer-master/modules.py")
    sys.path.insert(0, "/root/reference/set_transformer-master")
    models = load("ref_models_ck", "/root/reference/Code/models.py")
    if tag in ("FST", "3ST"):
        m = models.ST(dim_input=2 if tag == "FST" else 3, num_outputs=1,
                      dim_output=cfg.classes, num_inds=cfg.ninds,
                      dim_hidden=cfg.dhidden, num_heads=cfg.nheads)
    elif tag == "FB":
        m = models.baseline_ff(layer_dims=list(cfg.layers),
                               nclasses=cfg.classes, p=cfg.dropout_prob)
    else:
        m = models.CNN_classifier(Nt=cfg.Nt, Nf=cfg.Nf,
                                  layer_dims=list(cfg.layers),
                                  nclass=cfg.classes, p=cfg.dropout_prob)
    sd = torch.load(pth, map_location="cpu")
    sd = {k[len("module."):] if k.startswith("module.") else k: v
          for k, v in sd.items()}
    m.load_state_dict(sd)
    m.eval()
    with torch.no_grad():
        return m(torch.tensor(np.asarray(x))).numpy()


@needs_reference
@pytest.mark.parametrize("tag", ["FST", "3ST", "FB", "CNNTemp"])
def test_shipped_checkpoint_logit_parity(tag):
    cfg_path, pth = _ref_pair(tag)
    cfg = ExperimentConfig.from_reference_json(cfg_path)
    model = cfg.build_model()
    params = cfg.import_torch_checkpoint(pth)

    rng = np.random.default_rng(0)
    if tag == "FST":
        x = rng.standard_normal((4, 40, 2)).astype(np.float32)
        torch_tag = "FST"
    elif tag == "3ST":
        x = rng.standard_normal((4, 60, 3)).astype(np.float32)
        torch_tag = "3ST"
    elif tag == "FB":
        x = rng.standard_normal((4, cfg.layers[0])).astype(np.float32)
        torch_tag = "FB"
    else:
        x = rng.standard_normal((4, cfg.Nt, cfg.Nf)).astype(np.float32)
        torch_tag = "CNN"
    got = np.asarray(model.apply(params, jnp.asarray(x)))
    ref = _torch_forward(tag if tag != "CNNTemp" else "CNN", cfg, pth, x)
    np.testing.assert_allclose(got, ref, atol=5e-5, rtol=1e-4)
    if cfg.model_params is not None:
        n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
        assert n == cfg.model_params  # BASELINE.md parameter-count parity


@needs_reference
@pytest.mark.parametrize("tag,arch", [("FST", ARCH_FST), ("FB", ARCH_FB),
                                      ("3ST", ARCH_3ST), ("CNNTemp", ARCH_CNN)])
def test_config_roundtrip(tag, arch):
    cfg_path, _ = _ref_pair(tag)
    original = json.load(open(cfg_path))
    cfg = ExperimentConfig.from_reference_json(cfg_path)
    assert cfg.architecture == arch
    emitted = cfg.to_reference_json()
    assert set(emitted.keys()) == set(original.keys())
    for k, v in original.items():
        assert emitted[k] == v, k


def test_orbax_save_load_resume(tmp_path):
    cfg = ExperimentConfig(architecture=ARCH_FST, dhidden=8, nheads=2, ninds=4,
                           classes=3)
    model = cfg.build_model()
    params = model.init(jax.random.key(0), jnp.zeros((1, 8, 2)))
    d = str(tmp_path / "ckpt")
    save_checkpoint(d, params, cfg, step=10)
    save_checkpoint(d, jax.tree.map(lambda x: x + 1.0, params), cfg, step=20)
    tree, cfg2, step = load_checkpoint(d)
    assert step == 20
    assert cfg2.architecture == ARCH_FST and cfg2.dhidden == 8
    ref = jax.tree.map(lambda x: np.asarray(x) + 1.0, params)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-6),
                 tree["params"], ref)
    tree10, _, s10 = load_checkpoint(d, step=10)
    assert s10 == 10
