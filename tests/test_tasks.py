"""Task recipes: ModelNet40 pipeline on a synthetic h5, MoG clustering
learns, max-regression demo trains."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pcaudio.data.modelnet40 import ModelNet40Fetcher, rotate_z, standardize
from pcaudio.tasks.clustering import (
    ClusteringConfig,
    benchmark,
    make_train_step,
    build,
    mog_log_likelihood,
    parse_raw,
    sample_mog,
)
from pcaudio.tasks.max_regression import SmallDeepSet, SmallSetTransformer, train as train_max
from pcaudio.tasks.modelnet40 import ModelNet40Config, train as train_mn40
from pcaudio.train.step import TrainState


@pytest.fixture(scope="module")
def mn40_h5(tmp_path_factory):
    import h5py

    rng = np.random.default_rng(0)
    p = str(tmp_path_factory.mktemp("mn40") / "mn40.h5")
    ncls = 2
    ntr, nte, npts = 40, 20, 200
    lab_tr = rng.integers(0, ncls, ntr)
    lab_te = rng.integers(0, ncls, nte)

    # Class signal must SURVIVE the pipeline's per-cloud standardization
    # (zero mean / unit std over ALL coords, `data/modelnet40.py`): a
    # class-dependent mean offset is erased by it, so use class-dependent
    # axis-scale RATIOS (relative variances per axis are standardize-
    # invariant).  Two well-separated classes: the faithful torch-default
    # init (see nn/attention.py::torch_dense) bootstraps the ln=False ST
    # slowly, so the task must be separable within a CI-sized run.
    def clouds_for(labels):
        x = rng.standard_normal((len(labels), npts, 3))
        scl = np.stack([np.ones(len(labels)),
                        1.0 + 3.0 * labels,
                        1.0 / (1.0 + 2.0 * labels)], axis=-1)
        return x * scl[:, None, :]

    tr, te = clouds_for(lab_tr), clouds_for(lab_te)
    with h5py.File(p, "w") as f:
        f["tr_cloud"], f["tr_labels"] = tr, lab_tr
        f["test_cloud"], f["test_labels"] = te, lab_te
    return p


def test_fetcher_shapes_and_quirks(mn40_h5):
    f = ModelNet40Fetcher(mn40_h5, batch_size=8, down_sample=4)
    batches = list(f.train_data())
    assert len(batches) == 4  # 40/8 = 5, final batch dropped (reference quirk)
    clouds, card, labels = batches[0]
    assert clouds.shape == (8, 50, 3) and card[0] == 50 and labels.shape == (8,)
    tb = list(f.test_data())
    assert tb[0][0].shape == (8, 50, 3)  # [1::4] stride of 200 -> 50
    # standardize: per-cloud zero mean unit std
    s = standardize(np.random.default_rng(1).standard_normal((3, 64, 3)))
    assert np.allclose(s.mean(axis=(1, 2)), 0, atol=1e-6)
    assert np.allclose(s.std(axis=(1, 2)), 1, atol=1e-5)
    # rotate_z preserves z and norms
    x = np.random.default_rng(2).standard_normal((2, 16, 3))
    r = rotate_z(np.array([0.3, -0.2]), x)
    np.testing.assert_allclose(r[..., 2], x[..., 2])
    np.testing.assert_allclose(
        np.linalg.norm(r[..., :2], axis=-1), np.linalg.norm(x[..., :2], axis=-1),
        rtol=1e-6)


def test_modelnet40_training_improves(mn40_h5):
    cfg = ModelNet40Config(num_pts=50, dim=32, n_heads=4, n_anc=4,
                           batch_size=8, dim_output=2, learning_rate=3e-3)
    state, hist = train_mn40(cfg, mn40_h5, epochs=20, eval_every=1,
                             log=lambda s: None)
    # Deterministic seeded run on CPU: by the end the model separates the
    # two scale-signature classes (chance = 0.5; measured tail accs
    # 0.69-0.75) and train loss sits below its epoch-0 value.
    assert min(h["train_loss"] for h in hist[-6:]) < hist[0]["train_loss"]
    assert np.mean([h["test_accuracy"] for h in hist[-3:]]) > 0.55


def test_mog_sampling_and_likelihood():
    X, labels, pi, (mu, sigma) = sample_mog(jax.random.key(0), 4, 200, 3)
    assert X.shape == (4, 200, 2) and pi.shape == (4, 3)
    np.testing.assert_allclose(np.asarray(pi).sum(-1), 1.0, rtol=1e-5)
    ll_true = mog_log_likelihood(X, pi, mu, sigma)
    # oracle beats a wrong model (shuffled means)
    ll_wrong = mog_log_likelihood(X, pi, mu[:, ::-1], sigma)
    assert float(ll_true) > float(ll_wrong)


def test_clustering_trains_toward_oracle():
    cfg = ClusteringConfig(K=2, B=8, N_min=50, N_max=80, num_steps=200)
    model, optimizer, params = build(cfg)
    state = TrainState.create(params, optimizer)
    step = make_train_step(model, optimizer, cfg)
    key = jax.random.key(0)
    first = None
    for t in range(120):
        key, s1, s2 = jax.random.split(key, 3)
        X, *_ = sample_mog(s1, cfg.B, 64, cfg.K, cfg.dim)
        state, loss = step(state, X, s2)
        if first is None:
            first = float(loss)
    assert float(loss) < first
    mll, oll = benchmark(model, state.params, cfg, num_batches=3)
    assert np.isfinite(mll) and np.isfinite(oll) and oll >= mll - 1.0


def test_max_regression_models_train():
    st_params, st_mae = train_max(SmallSetTransformer(dim_hidden=16, num_heads=2),
                                  steps=150)
    ds_params, ds_mae = train_max(SmallDeepSet(pool="max", dim_hidden=16),
                                  steps=150)
    assert st_mae < 1.0 and ds_mae < 1.0
