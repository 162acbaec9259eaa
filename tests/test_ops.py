"""Point-cloud op parity vs reference golden outputs (tests/golden/ops.npz,
generated from Code/dataset.py + Code/utils.py) plus statistical checks for
the random policies.

Layout note: the reference keeps spectrograms frequency-major ``[F, T]`` /
``[F, Nt, B]``; pcaudio is frames-major ``[T, F]`` / ``[B, Nt, F]`` — tests
transpose at the boundary.
"""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pcaudio.ops import (
    frame_cloud,
    grid_cloud,
    grid_top_k_replace,
    importance_heatmap,
    importance_sample_cloud,
    rand_k_points,
    rand_k_points_masked,
    top_k_points,
    top_k_points_masked,
    top_k_replace,
)

Z = np.load(os.path.join(os.path.dirname(__file__), "golden", "ops.npz"))


def test_frame_cloud():
    frames = jnp.asarray(Z["x_frames"].T)  # [T, F]
    got = frame_cloud(frames, jnp.asarray(Z["farr"]))
    np.testing.assert_allclose(np.asarray(got), Z["pc_frames"], rtol=1e-6)


def test_top_k_frame_clouds():
    clouds = frame_cloud(jnp.asarray(Z["x_frames"].T), jnp.asarray(Z["farr"]))
    got = top_k_points(clouds, 100)
    np.testing.assert_allclose(np.asarray(got), Z["pc_maxk_clouds"], rtol=1e-6)


def test_top_k_replace():
    got = top_k_replace(jnp.asarray(Z["x_frames"].T), 100)
    np.testing.assert_allclose(np.asarray(got).T, Z["pc_maxk_replace"], rtol=1e-6)


def _grids_tf():
    return jnp.asarray(Z["grid"].transpose(2, 1, 0))  # [B, Nt, F]


def test_grid_cloud():
    got = grid_cloud(_grids_tf(), jnp.asarray(Z["farr_t"]), jnp.asarray(Z["tarr"]))
    np.testing.assert_allclose(np.asarray(got), Z["temp_clouds"], rtol=1e-6)


def test_top_k_temporal_clouds():
    clouds = grid_cloud(_grids_tf(), jnp.asarray(Z["farr_t"]), jnp.asarray(Z["tarr"]))
    got = top_k_points(clouds, 77)
    np.testing.assert_allclose(np.asarray(got), Z["temp_maxk_clouds"], rtol=1e-6)


def test_importance_topk_clouds():
    """choice=1 importance sampling is deterministic: heat-map (gradient +
    Kaiser smoothing + torch-'same' cross-correlation) and the reference's
    flat-index convention must reproduce the exact selected points."""
    grids = _grids_tf()
    clouds = grid_cloud(grids, jnp.asarray(Z["farr_t"]), jnp.asarray(Z["tarr"]))
    heat = importance_heatmap(grids, win_f=64)
    got = importance_sample_cloud(clouds, heat, k=100, choice=1)
    np.testing.assert_allclose(
        np.asarray(got), Z["temp_imp_top_clouds"], rtol=1e-4, atol=1e-6
    )


def test_grid_top_k_replace():
    got = grid_top_k_replace(_grids_tf(), 200, flag="max")
    np.testing.assert_allclose(np.asarray(got), Z["temp_grid_maxk"], rtol=1e-6)


# ---------- random policies: statistical/structural checks ----------

def test_rand_k_points_structure():
    key = jax.random.key(0)
    pts = jnp.stack([jnp.arange(50, dtype=jnp.float32)] * 3, axis=-1)[None]
    got = np.asarray(rand_k_points(key, pts, 20))[0]
    ids = got[:, 0].astype(int)
    assert len(np.unique(ids)) == 20  # without replacement
    # different keys -> different subsets (overwhelmingly likely)
    got2 = np.asarray(rand_k_points(jax.random.key(1), pts, 20))[0]
    assert not np.array_equal(got, got2)


def test_rand_k_uniformity():
    """Each point selected with probability ~K/N under uniform-K."""
    key = jax.random.key(42)
    n, k, trials = 64, 16, 2000
    pts = jnp.arange(n, dtype=jnp.float32)[None, :, None]
    counts = np.zeros(n)
    keys = jax.random.split(key, trials)
    sel = jax.vmap(lambda kk: rand_k_points(kk, pts, k)[0, :, 0])(keys)
    sel = np.asarray(sel).astype(int)
    for row in sel:
        counts[row] += 1
    p = counts / trials
    assert abs(p.mean() - k / n) < 1e-9
    assert np.all(np.abs(p - k / n) < 0.05)


def test_masked_top_k_excludes_padding():
    pts = jnp.stack(
        [jnp.arange(10, dtype=jnp.float32), jnp.arange(10, dtype=jnp.float32)],
        axis=-1,
    )[None]
    mask = jnp.asarray([[True] * 6 + [False] * 4])
    out, out_mask = top_k_points_masked(pts, mask, 4)
    # top-4 of the *valid* points are 5,4,3,2 — never the padded 9,8,7,6
    np.testing.assert_array_equal(np.asarray(out[0, :, 0]), [5, 4, 3, 2])
    assert np.asarray(out_mask).all()


def test_masked_top_k_fewer_valid_than_k():
    pts = jnp.ones((1, 8, 2))
    mask = jnp.asarray([[True, True, False, False, False, False, False, False]])
    out, out_mask = top_k_points_masked(pts, mask, 5)
    assert np.asarray(out_mask).sum() == 2


def test_masked_rand_k_only_valid():
    key = jax.random.key(7)
    pts = jnp.arange(30, dtype=jnp.float32)[None, :, None]
    mask = jnp.arange(30)[None, :] < 12
    out, out_mask = rand_k_points_masked(key, pts, mask, 10)
    sel = np.asarray(out[0, :, 0]).astype(int)
    assert np.asarray(out_mask).all()
    assert (sel < 12).all() and len(np.unique(sel)) == 10
