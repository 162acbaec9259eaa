"""Training-step tests: optimizer parity vs torch Adam, learning on synthetic
sets, and mesh data-parallel equivalence on the 8-device CPU mesh."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pcaudio.nn import ST, BaselineFF
from pcaudio.parallel import make_mesh, shard_batch
from pcaudio.train import (
    TrainState,
    adam_l2,
    dropout_apply,
    jit_train_step,
    make_eval_step,
    make_train_step,
    pointcloud_apply,
)


def _synthetic_sets(rng, n, k=32):
    """Two trivially separable classes: clouds centered at +1 vs -1."""
    labels = rng.integers(0, 2, n)
    centers = np.where(labels[:, None, None] == 1, 1.0, -1.0)
    points = centers + 0.1 * rng.standard_normal((n, k, 2))
    return points.astype(np.float32), labels.astype(np.int32)


def test_adam_l2_matches_torch():
    """optax chain == torch.optim.Adam(lr, weight_decay) over 10 steps."""
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    w0 = rng.standard_normal((4, 3)).astype(np.float32)
    xs = rng.standard_normal((10, 4)).astype(np.float32)

    # torch: minimize sum((x @ w)**2) with wd
    wt = torch.tensor(w0.copy(), requires_grad=True)
    opt = torch.optim.Adam([wt], lr=1e-2, weight_decay=1e-3)
    for i in range(10):
        opt.zero_grad()
        loss = ((torch.tensor(xs[i]) @ wt) ** 2).sum()
        loss.backward()
        opt.step()

    optimizer = adam_l2(1e-2, weight_decay=1e-3)
    wj = jnp.asarray(w0)
    state = optimizer.init(wj)
    for i in range(10):
        g = jax.grad(lambda w: jnp.sum((xs[i] @ w) ** 2))(wj)
        upd, state = optimizer.update(g, state, wj)
        wj = wj + jax.tree.map(lambda u: u, upd)
    np.testing.assert_allclose(np.asarray(wj), wt.detach().numpy(), atol=1e-5)


def test_st_learns_synthetic():
    rng = np.random.default_rng(1)
    pts, lbl = _synthetic_sets(rng, 64)
    model = ST(dim_input=2, dim_output=2, num_inds=8, dim_hidden=16, num_heads=4)
    params = model.init(jax.random.key(0), jnp.zeros((1, 32, 2)))
    optimizer = adam_l2(1e-3, weight_decay=1e-3)
    state = TrainState.create(params, optimizer)
    step = jit_train_step(make_train_step(pointcloud_apply(model), optimizer))
    batch = {"points": jnp.asarray(pts), "labels": jnp.asarray(lbl)}
    first_loss = None
    for i in range(60):
        state, metrics = step(state, batch, jax.random.key(i))
        if first_loss is None:
            first_loss = float(metrics["loss"])
    assert float(metrics["loss"]) < first_loss * 0.5
    assert float(metrics["accuracy"]) > 0.9
    assert int(state.step) == 60


def test_recipe_fused_attn_convergence_matches_xla():
    """build_trainer(fused_attn=True) — the TPU-default training path —
    produces the same loss curve as the XLA attention over real optimizer
    steps (Pallas custom-VJP kernels in interpret mode on CPU)."""
    from pcaudio.core.config import ARCH_FST, ExperimentConfig
    from pcaudio.train import build_trainer

    cfg = ExperimentConfig(architecture=ARCH_FST, window_size=2048,
                           dhidden=16, nheads=4, ninds=8, batch_size=32,
                           learning_rate=1e-3, weight_decay=1e-3, epochs=1)
    rng = np.random.default_rng(7)
    pts, lbl = _synthetic_sets(rng, 32, k=16)
    batch = {"points": jnp.asarray(pts), "labels": jnp.asarray(lbl)}

    curves = {}
    for fused in (False, True):
        model, apply_fn, opt = build_trainer(cfg, fused_attn=fused)
        params = model.init(jax.random.key(0), jnp.zeros((1, 16, 2)))
        state = TrainState.create(params, opt)
        step = jit_train_step(make_train_step(apply_fn, opt),
                              donate_state=False)
        losses = []
        for i in range(15):
            state, metrics = step(state, batch, jax.random.key(i))
            losses.append(float(metrics["loss"]))
        curves[fused] = losses
    np.testing.assert_allclose(curves[True], curves[False],
                               rtol=0.05, atol=0.02)
    assert curves[True][-1] < curves[True][0] * 0.7  # actually learning


def test_baseline_ff_dropout_train_step():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((16, 32)).astype(np.float32)
    lbl = (x.mean(-1) > 0).astype(np.int32)
    model = BaselineFF(layer_dims=(32, 16), nclasses=2)
    params = model.init(jax.random.key(0), jnp.zeros((1, 32)))
    optimizer = adam_l2(1e-3)
    state = TrainState.create(params, optimizer)
    step = jit_train_step(make_train_step(dropout_apply(model), optimizer))
    batch = {"x": jnp.asarray(x), "labels": jnp.asarray(lbl)}
    for i in range(5):
        state, metrics = step(state, batch, jax.random.key(i))
    assert np.isfinite(float(metrics["loss"]))


def test_mesh_dp_matches_single_device():
    """Data-parallel over the 8-device CPU mesh computes the same update as
    unsharded execution (the DataParallel-semantics guarantee)."""
    assert jax.device_count() >= 8
    rng = np.random.default_rng(3)
    pts, lbl = _synthetic_sets(rng, 32)
    model = ST(dim_input=2, dim_output=2, num_inds=4, dim_hidden=8, num_heads=2)
    params = model.init(jax.random.key(0), jnp.zeros((1, 32, 2)))
    # SGD, not Adam: Adam's m/sqrt(v) amplifies summation-order noise on
    # near-zero grads into O(lr) update differences, which would test float
    # associativity rather than sharding correctness.
    import optax
    optimizer = optax.sgd(1e-2)
    step_fn = make_train_step(pointcloud_apply(model), optimizer)

    batch = {"points": jnp.asarray(pts), "labels": jnp.asarray(lbl)}
    s_ref = TrainState.create(params, optimizer)
    s_ref, m_ref = jit_train_step(step_fn, donate_state=False)(
        s_ref, batch, jax.random.key(0)
    )

    mesh = make_mesh(n_data=8)
    sharded = shard_batch(mesh, {"points": pts, "labels": lbl})
    s_dp = TrainState.create(params, optimizer)
    s_dp, m_dp = jit_train_step(step_fn, mesh=mesh, donate_state=False)(
        s_dp, sharded, jax.random.key(0)
    )
    np.testing.assert_allclose(
        float(m_dp["loss"]), float(m_ref["loss"]), rtol=1e-5
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5
        ),
        s_dp.params,
        s_ref.params,
    )


def test_mesh_set_axis_sharding():
    """Sharding the point dimension across the set axis (CP analogue) still
    produces the same logits."""
    model = ST(dim_input=2, dim_output=2, num_inds=4, dim_hidden=8, num_heads=2)
    rng = np.random.default_rng(4)
    pts = rng.standard_normal((4, 64, 2)).astype(np.float32)
    params = model.init(jax.random.key(0), jnp.zeros((1, 64, 2)))
    ref = model.apply(params, jnp.asarray(pts))

    mesh = make_mesh(n_data=2, n_set=4)
    x = shard_batch(mesh, pts, shard_set_axis=True)
    got = jax.jit(model.apply)(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_eval_step_counts():
    model = ST(dim_input=2, dim_output=2, num_inds=4, dim_hidden=8, num_heads=2)
    params = model.init(jax.random.key(0), jnp.zeros((1, 8, 2)))
    ev = jax.jit(make_eval_step(pointcloud_apply(model)))
    pts = jnp.zeros((6, 8, 2))
    lbl = jnp.zeros((6,), jnp.int32)
    correct, total = ev(params, {"points": pts, "labels": lbl})
    assert int(total) == 6 and 0 <= int(correct) <= 6


def test_multihost_global_mesh():
    """global_mesh covers all (virtual) devices with the (data, set) axes."""
    from pcaudio.parallel.multihost import global_mesh, local_batch_slice

    mesh = global_mesh(n_set=2)
    assert mesh.shape["data"] * mesh.shape["set"] == 8
    s = local_batch_slice(64)
    assert s == slice(0, 64)  # single process owns the whole batch


def test_remat_train_step_matches_plain():
    """jax.checkpoint train step: identical updates, recomputed activations."""
    from pcaudio.train import adam_l2

    rng = np.random.default_rng(5)
    model = ST(dim_input=2, dim_output=4, num_inds=4, dim_hidden=8,
               num_heads=2)
    params = model.init(jax.random.key(0), jnp.zeros((1, 8, 2)))
    opt = adam_l2(1e-3, weight_decay=1e-3)
    batch = {
        "points": jnp.asarray(rng.standard_normal((6, 12, 2)),
                              dtype=jnp.float32),
        "labels": jnp.asarray(rng.integers(0, 4, 6)),
    }
    apply = pointcloud_apply(model)
    s0 = TrainState.create(params, opt)
    key = jax.random.key(1)
    plain = jax.jit(make_train_step(apply, opt))
    remat = jax.jit(make_train_step(apply, opt, remat=True))
    sp, mp = plain(s0, batch, key)
    sr, mr = remat(s0, batch, key)
    np.testing.assert_allclose(float(mp["loss"]), float(mr["loss"]),
                               rtol=1e-6)
    for a, b in zip(jax.tree.leaves(sp.params), jax.tree.leaves(sr.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=1e-6)
