"""Time the v6 pallas_call with pre-packed operands (no XLA glue)."""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pcaudio.nn import ST
from pcaudio.ops.kernels import fused_st as fst


def main(mode="wjit"):
    model = ST(dim_input=3, num_outputs=1, dim_output=10,
               num_inds=64, dim_hidden=64, num_heads=8, dtype=jnp.bfloat16)
    params = model.init(jax.random.key(0), jnp.zeros((1, 16, 3)))
    p = params["params"]

    rng = np.random.default_rng(0)
    B, K, din, dv, m, h, ncls = 5504, 128, 3, 64, 64, 8, 10
    block_b = 16
    Pn, Pb = B // 2, block_b // 2

    # replicate fused_st_forward's v6 prep OUTSIDE the timed jit
    dtype = jnp.bfloat16

    def isab_weights(ip):
        I = ip["I"][0]
        _, _, *kv0 = fst._mab_weights(ip["mab0"], dtype)
        iq = I.astype(jnp.float32) @ ip["mab0"]["fc_q"]["kernel"] + \
            ip["mab0"]["fc_q"]["bias"]
        wq1, bq1, wk1, bk1, wv1, bv1, wo1, bo1 = fst._mab_weights(
            ip["mab1"], dtype)
        return ([fst._bd_queries(iq, h).astype(dtype),
                 iq.astype(jnp.float32)] + kv0
                + [wq1, bq1, wk1, bk1, wv1, bv1, wo1, bo1])

    w = []
    w += isab_weights(p["enc_0"])
    w += isab_weights(p["enc_1"])
    pp = p["dec_pma"]
    S = pp["S"][0]
    sq = S.astype(jnp.float32) @ pp["mab"]["fc_q"]["kernel"] + \
        pp["mab"]["fc_q"]["bias"]
    _, _, *kvp = fst._mab_weights(pp["mab"], dtype)
    w += [fst._bd_queries(sq, h).astype(dtype), sq.astype(jnp.float32)] + kvp
    dw, db = fst._dense_wb(p["dec_out"], dtype)
    w += [dw, db]
    if mode == "wjit":
        w6_make = lambda: fst._pack_weights_v6(w, h, dv, m, ncls)
    else:
        w6_host = [jax.device_put(x) for x in
                   fst._pack_weights_v6(w, h, dv, m, ncls)]
        w6_make = lambda: w6_host

    pts = jax.device_put(jnp.asarray(
        rng.standard_normal((B, K, din)).astype(np.float32)))
    mb = jax.device_put(jnp.zeros((B, K), jnp.float32))

    kernel = fst._make_kernel_v6(h, dv, m, din, ncls, block_b, K)

    @jax.jit
    def run(pts, mb):
        w6 = w6_make()
        pts_p = jnp.concatenate([pts[:Pn], pts[Pn:]], axis=-1)
        mb_p = jnp.stack([mb[:Pn], mb[Pn:]], axis=1)
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((Pn, 2 * ncls), jnp.float32),
            grid=(Pn // Pb,),
            in_specs=[
                pl.BlockSpec((Pb, K, 2 * din), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Pb, 2, K), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ] + [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in w6],
            out_specs=pl.BlockSpec((Pb, 2 * ncls), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",),
                vmem_limit_bytes=96 * 1024 * 1024,
            ),
        )(pts_p, mb_p, *w6)


    t0 = time.perf_counter()
    out = run(pts, mb)
    float(jnp.sum(out))
    print(f"compile {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    for _ in range(20):
        out = run(pts, mb)
    float(jnp.sum(out))
    dt = (time.perf_counter() - t0) / 20
    print(f"bare v6 pallas: {dt*1e3:.2f} ms/batch "
          f"{dt/B*1e6:.2f} us/chunk", flush=True)


if __name__ == "__main__":
    import sys
    main(sys.argv[1] if len(sys.argv) > 1 else "wjit")
