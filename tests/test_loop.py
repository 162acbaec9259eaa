"""Train loop + recipes: end-to-end training on synthetic audio for all four
reference recipes (tiny overrides), with checkpointing and resume."""
import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pcaudio.core.config import ARCH_3ST, ARCH_CNN, ARCH_FB, ARCH_FST
from pcaudio.train import TrainState, jit_train_step, make_eval_step, make_train_step
from pcaudio.train.loop import fit
from pcaudio.train.recipes import (
    RECIPES,
    build_trainer,
    prepare_framewise_data,
    prepare_temporal_data,
)
from pcaudio.checkpoint.orbax_io import load_checkpoint


def _audio(B=6, fs=8000, seconds=0.6, L=8192):
    rng = np.random.default_rng(0)
    w = np.zeros((B, L), np.float32)
    n = int(fs * seconds)
    labels = np.arange(B) % 2
    for i in range(B):
        f0 = 400.0 if labels[i] == 0 else 1500.0
        w[i, :n] = 0.3 * np.sin(2 * np.pi * f0 * np.arange(n) / fs)
        w[i, :n] += 0.01 * rng.standard_normal(n)
    return w, np.full((B,), n, np.int32), labels.astype(np.int32)


def _tiny(cfg):
    over = dict(window_size=256, sampling_rate=8000, classes=2, batch_size=4,
                epochs=3)
    if cfg.architecture in (ARCH_FST, ARCH_3ST):
        over.update(dhidden=8, nheads=2, ninds=4)
    if cfg.architecture == ARCH_FB:
        over.update(layers=[129, 16])
    if cfg.architecture == ARCH_CNN:
        over.update(Ntemp=4, Nt=4, Nf=128, layers=[128, 16])
    if cfg.architecture == ARCH_3ST:
        over.update(Ntemp=4)
    return dataclasses.replace(cfg, **over)


@pytest.mark.parametrize("tag", ["FST", "FB", "3ST", "CNNTemp"])
def test_recipe_trains(tag, tmp_path):
    cfg = _tiny(RECIPES[tag]())
    waves, lengths, labels = _audio()
    if cfg.architecture in (ARCH_FST, ARCH_FB):
        data = prepare_framewise_data(waves, lengths, labels, cfg,
                                      as_clouds=cfg.architecture == ARCH_FST)
    else:
        data = prepare_temporal_data(waves, lengths, labels, cfg,
                                     as_clouds=cfg.architecture == ARCH_3ST)
    assert len(data["labels"]) > 8

    model, apply_fn, optimizer = build_trainer(cfg)
    sample = {k: v[:1] for k, v in data.items()}
    if "points" in sample:
        params = model.init(jax.random.key(0), jnp.asarray(sample["points"]))
    else:
        params = model.init(jax.random.key(0), jnp.asarray(sample["x"]))
    state = TrainState.create(params, optimizer)
    step = jit_train_step(make_train_step(apply_fn, optimizer))
    ev = jax.jit(make_eval_step(apply_fn))
    state, hist = fit(
        state, step, data, batch_size=cfg.batch_size, epochs=cfg.epochs,
        eval_data=data, eval_step=ev, eval_every=2,
        checkpoint_dir=str(tmp_path / "ck"), checkpoint_every=2, config=cfg,
        log=lambda s: None,
    )
    assert len(hist) == 3
    assert hist[-1]["train_loss"] <= hist[0]["train_loss"] + 0.5
    assert "test_accuracy" in hist[0]

    tree, cfg2, step_n = load_checkpoint(str(tmp_path / "ck"))
    assert step_n == 2
    assert cfg2.architecture == cfg.architecture


def test_save_same_step_twice_overwrites(tmp_path):
    # The end-of-train save reuses the step number of the last periodic save
    # whenever epochs % checkpoint_every == 0 (cli.cmd_train); orbax must
    # overwrite, not raise "Destination ... already exists".
    from pcaudio.checkpoint.orbax_io import save_checkpoint

    d = str(tmp_path / "ck")
    save_checkpoint(d, {"w": np.ones((3,))}, step=4)
    save_checkpoint(d, {"w": np.zeros((3,))}, step=4)
    tree, _, step_n = load_checkpoint(d)
    assert step_n == 4
    np.testing.assert_array_equal(tree["params"]["w"], np.zeros((3,)))
