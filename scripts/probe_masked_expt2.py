"""Measure the device cost of the masked prefix-sweep expt2 engine.

Times on the real chip:
  1. one masked ST eval, f32 vs bf16, framewise shape [1024, 1024, 2];
  2. the full scan-over-K x (1 max + 10 rand runs) program for one
     microbatch (framewise, 21 Ks);
  3. the temporal shape [128, 5120, 3] single eval;
  4. per-dispatch tunnel overhead (trivial jitted fn).

Decides whether expt2 can run dense-masked (one compile) or needs
bucketed static shapes / the fused serving kernel.
"""
import time

import numpy as np


def _t(fn, *args, iters=5):
    import jax
    import jax.numpy as jnp
    out = fn(*args)
    jax.block_until_ready(out)
    float(jnp.sum(out if isinstance(out, jnp.ndarray) else out[0]))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    leaf = out if isinstance(out, jnp.ndarray) else out[0]
    float(jnp.sum(leaf))  # flush queue (axon: block_until_ready lies)
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp
    from functools import partial

    from pcaudio.nn import ST

    rng = np.random.default_rng(0)

    for tag, (B, n, d) in (("framewise", (1024, 1024, 2)),
                           ("temporal", (128, 5120, 3))):
        clouds = jax.device_put(jnp.asarray(
            rng.standard_normal((B, n, d)).astype(np.float32)))
        for dt_tag, dtype in (("f32", None), ("bf16", jnp.bfloat16)):
            model = ST(dim_input=d, num_outputs=1, dim_output=10,
                       num_inds=64, dim_hidden=64, num_heads=8, dtype=dtype)
            params = model.init(jax.random.key(0), clouds[:1])

            @jax.jit
            def one_eval(c):
                mask = jnp.broadcast_to(
                    (jnp.arange(n) < n // 2)[None], (B, n))
                return model.apply(params, c, mask=mask)

            dt = _t(one_eval, clouds)
            print(f"{tag} {dt_tag} masked eval [{B},{n},{d}]: "
                  f"{dt*1e3:.1f} ms -> {B/dt:.0f} clouds/s", flush=True)

        # full scan program (bf16): 21 Ks x (1 max + 10 rand) per microbatch
        model = ST(dim_input=d, num_outputs=1, dim_output=10,
                   num_inds=64, dim_hidden=64, num_heads=8,
                   dtype=jnp.bfloat16)
        params = model.init(jax.random.key(0), clouds[:1])
        Ks = jnp.asarray(np.arange(1, n // 2, 50), jnp.int32)  # ~10-51 Ks
        R = 10
        # ordered clouds per run: here reuse the same cloud (timing only)
        ordered_r = jnp.broadcast_to(clouds[None], (R,) + clouds.shape)
        labels = jnp.zeros((B,), jnp.int32)

        @jax.jit
        def sweep(c_max, c_rand):
            pos = jnp.arange(n)

            def body(_, K):
                m = jnp.broadcast_to((pos < K)[None], (B, n))
                ok_max = jnp.sum(
                    jnp.argmax(model.apply(params, c_max, mask=m), -1)
                    == labels)

                def run_body(_, cr):
                    return None, jnp.sum(
                        jnp.argmax(model.apply(params, cr, mask=m), -1)
                        == labels)

                _, ok_r = jax.lax.scan(run_body, None, c_rand)
                return None, (ok_max, ok_r)

            _, out = jax.lax.scan(body, None, Ks)
            return out[0]

        t0 = time.perf_counter()
        out = sweep(clouds, ordered_r)
        float(jnp.sum(out))
        t_first = time.perf_counter() - t0
        dt = _t(sweep, clouds, ordered_r, iters=2)
        nev = len(Ks) * (1 + R)
        print(f"{tag} bf16 sweep scan ({len(Ks)} Ks x {1+R}): compile+run "
              f"{t_first:.1f}s, steady {dt:.2f}s -> "
              f"{B*nev/dt:.0f} cloud-evals/s", flush=True)

    # dispatch overhead
    x = jnp.zeros((8,), jnp.float32)
    f = jax.jit(lambda v: v + 1)
    dt = _t(f, x, iters=50)
    print(f"trivial dispatch: {dt*1e3:.2f} ms/call", flush=True)


if __name__ == "__main__":
    main()
