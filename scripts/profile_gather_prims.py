"""Cost of candidate primitives for boundary-frame construction + trim.

(a) vmapped dynamic_slice of contiguous samples (what _patch_frames-ish does)
(b) take_along_axis row gather from the [B, R, hop] view
(c) one-hot matmul row selection
(d) full reshape-square-reduce over the wave batch (trim energy pass)
(e) two-stage exact top-k on bf16 chunk mags
"""
import time

import numpy as np
import jax
import jax.numpy as jnp


def sync(x):
    return float(jnp.sum(jax.tree.leaves(x)[0][..., :4].astype(jnp.float32)))


def bench(name, fn, *args, iters=10):
    jf = jax.jit(fn)
    sync(jf(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jf(*args)
    sync(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:52s} {dt*1e3:8.2f} ms", flush=True)
    return out


def main():
    B, L, hop = 512, 220672, 512
    R = L // hop
    rng = np.random.default_rng(0)
    waves = jax.device_put(jnp.asarray(
        (0.1 * rng.standard_normal((B, L))).astype(np.float32)))
    starts = jax.device_put(jnp.asarray(
        rng.integers(0, L - 4096, B), jnp.int32))
    x3 = waves.reshape(B, R, hop)

    # (a) vmapped dynamic_slice 1024 samples
    bench("(a) vmapped dynamic_slice [B,1024]",
          lambda w, s: jax.vmap(
              lambda wi, si: jax.lax.dynamic_slice(wi, (si,), (1024,))
          )(w, s), waves, starts)

    # (a2) vmapped dynamic_slice 2048
    bench("(a2) vmapped dynamic_slice [B,2048]",
          lambda w, s: jax.vmap(
              lambda wi, si: jax.lax.dynamic_slice(wi, (si,), (2048,))
          )(w, s), waves, starts)

    # (b) take_along_axis row gather: 6 rows of hop=512 per clip
    rows = (starts // hop)[:, None] + jnp.arange(6)[None, :]
    bench("(b) take_along_axis 6 rows [B,6,512]",
          lambda x, r: jnp.take_along_axis(x, r[:, :, None], axis=1),
          x3, rows)

    # (c) one-hot matmul row selection: 6 one-hot rows against [R, hop]
    def onehot_sel(x, s):
        r0 = (s // hop)
        iota = jnp.arange(R)[None, None, :]
        oh = (iota == (r0[:, None, None] + jnp.arange(6)[None, :, None])
              ).astype(jnp.bfloat16)
        return jnp.einsum("bkr,brh->bkh", oh, x.astype(jnp.bfloat16))

    bench("(c) one-hot matmul 6 rows", onehot_sel, x3, starts)

    # (d) energy pass: reshape-square-reduce
    bench("(d) block energies sum(x^2) [B,R]",
          lambda x: jnp.sum(x.astype(jnp.float32) ** 2, axis=-1), x3)

    # (d2) with the length mask multiply (extra pass)
    lengths = jnp.full((B,), 220500, jnp.int32)
    def energy_masked(w, l):
        x = w * (jnp.arange(L)[None, :] < l[:, None])
        return jnp.sum((x * x).reshape(B, R, hop), axis=-1)
    bench("(d2) masked energy (2-pass)", energy_masked, waves, lengths)

    # (e) selection strategies on chunk mags [B, 43, 5120] bf16
    C = 43
    mags = jax.device_put(jnp.asarray(
        rng.standard_normal((B, C, 5120)).astype(np.float32),
        dtype=jnp.bfloat16))

    def two_stage(m):
        v1, i1 = jax.lax.top_k(m.reshape(B, C, 10, 512), 128)
        flat_i = i1 + jnp.arange(10)[None, None, :, None] * 512
        vals, i2 = jax.lax.top_k(v1.reshape(B, C, 10 * 128), 128)
        idx = jnp.take_along_axis(flat_i.reshape(B, C, 10 * 128), i2, axis=-1)
        return vals, idx

    bench("(e) two-stage exact top-k bf16", two_stage, mags)

    def two_stage_approx(m):
        v1, i1 = jax.lax.approx_max_k(m.reshape(B, C * 10, 512), 128,
                                      recall_target=0.95)
        flat_i = (i1.reshape(B, C, 10, 128)
                  + jnp.arange(10)[None, None, :, None] * 512)
        vals, i2 = jax.lax.top_k(v1.reshape(B, C, 10 * 128), 128)
        idx = jnp.take_along_axis(flat_i.reshape(B, C, 10 * 128), i2, axis=-1)
        return vals, idx

    bench("(e2) approx-then-exact two-stage", two_stage_approx, mags)

    def sort_based(m):
        # full sort of each chunk, take last 128
        s = jnp.sort(m, axis=-1)
        return s[..., -128:]

    bench("(e3) full sort (values only)", sort_based, mags)


if __name__ == "__main__":
    main()
