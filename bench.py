"""Headline benchmark: end-to-end wave → point-cloud → class throughput.

Pipeline (one jitted program, reference 3ST semantics): trim(60 dB) →
STFT(1024) → log-mag → 10-frame temporal chunks → masked top-K point
extraction → Set Transformer (3ST config: 64 inducing points, dim 64,
8 heads, bf16 matmuls) → clip logits averaged over chunks.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...} where
vs_baseline is clips/sec/chip over the 10k-clips/sec/chip north-star target
(BASELINE.json; the reference publishes no throughput numbers).  The
canonical headline config is **B=1024, top-K 128, exact extraction (the
sort-free Pallas top-K kernel — reference top-K semantics, bit-identical
selected sets), bf16 spectrograms, fused Pallas ST** — the JSON also
reports the approx-extraction number (``approx_max_k`` recall 0.9, see
docs/PERFORMANCE.md for its accuracy evidence) and per-stage timings so
the two modes and the stage attribution are always visible side by side.
(B=1024 measured ~11%% faster per clip than 512 — 44k chunks per kernel
dispatch feed both v5e cores better; 2048 fails to compile on the remote
Mosaic toolchain and is caught by the fallback ladder.)

Env knobs: PCAUDIO_BENCH_BATCH (default 1024), PCAUDIO_BENCH_TOPK (default
128), PCAUDIO_BENCH_ITERS (default 10), PCAUDIO_BENCH_FUSED (default 1 —
the fully-fused Pallas ST kernel), PCAUDIO_BENCH_EXTRACTION (approx|exact),
PCAUDIO_BENCH_STAGES (default 1 — also time featurize+extract / ST-forward
and the other extraction mode), PCAUDIO_BENCH_MESH (default 1 — data-
parallel over an N-device mesh via shard_map; >1 needs N devices, e.g. the
8-virtual-CPU mesh used in tests).
"""
import json
import os
import sys
import time

import numpy as np


def _sync(x):
    # On the tunneled axon platform block_until_ready can return before
    # remote execution finishes; fetching a scalar reduction is a true
    # sync with negligible transfer.
    import jax.numpy as jnp

    return float(jnp.sum(x))


def _time(fn, *args, iters):
    # Best-of-R repeats of the averaged loop: e2e variance on the axon
    # tunnel measures ±4% run-to-run (docs/PERFORMANCE.md), and the min
    # estimates the chip's capability with tunnel hiccups excluded.
    repeats = max(1, int(os.environ.get("PCAUDIO_BENCH_REPEATS", "3")))
    _sync(fn(*args))  # warmup / compile
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        _sync(out)
        times.append((time.perf_counter() - t0) / iters)
    return min(times)


def main():
    import jax

    # Persistent compilation cache (same knob as pcaudio.cli): the bench's
    # programs are multi-minute remote compiles on the axon tunnel; a warm
    # cache makes re-runs and A/B variants ~free.
    cache = os.environ.get(
        "PCAUDIO_COMPILE_CACHE", os.path.expanduser("~/.cache/pcaudio_xla"))
    if cache and cache != "0":
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    mesh_n = int(os.environ.get("PCAUDIO_BENCH_MESH", "1"))
    if os.environ.get("PCAUDIO_BENCH_CPU", "0") == "1":
        # correctness runs on the N-virtual-device CPU mesh (tests/CI): must
        # happen before any backend touch, same recipe as __graft_entry__
        flags = os.environ.get("XLA_FLAGS", "")
        if "--xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={max(mesh_n, 1)}"
            ).strip()
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from pcaudio.eval import TemporalPipelineConfig, make_temporal_classifier
    from pcaudio.eval.pipeline import extract_chunk_clouds
    from pcaudio.nn import ST

    B = int(os.environ.get("PCAUDIO_BENCH_BATCH", "1024"))
    top_k = int(os.environ.get("PCAUDIO_BENCH_TOPK", "128"))
    iters = int(os.environ.get("PCAUDIO_BENCH_ITERS", "10"))
    fused = os.environ.get("PCAUDIO_BENCH_FUSED", "1") == "1"
    extraction = os.environ.get("PCAUDIO_BENCH_EXTRACTION", "exact")
    stft_precision = os.environ.get("PCAUDIO_BENCH_STFT_PRECISION", "default")
    compute_dtype = os.environ.get("PCAUDIO_BENCH_DTYPE", "bfloat16")
    stages = os.environ.get("PCAUDIO_BENCH_STAGES", "1") == "1"

    fs = 44100
    # 5 s ESC-50 clips, padded to a multiple of 1024 (shrinkable for CI runs)
    L = int(os.environ.get("PCAUDIO_BENCH_LEN", "220672"))

    featurize = os.environ.get("PCAUDIO_BENCH_FEATURIZE", "fused")

    # A/B knob; unset → the TemporalPipelineConfig default (32, the measured
    # serving winner — 91.0 vs 98.0 ms e2e at B=1024, round-5 A/B)
    st_bb = os.environ.get("PCAUDIO_BENCH_ST_BLOCK_B")
    bb_kw = {"st_block_b": int(st_bb)} if st_bb else {}

    def make_cfg(extr):
        return TemporalPipelineConfig(fs=fs, n_fft=1024, num_frames=10,
                                      top_k=top_k, extraction=extr,
                                      stft_precision=stft_precision,
                                      compute_dtype=compute_dtype,
                                      featurize=featurize, **bb_kw)

    cfg = make_cfg(extraction)
    model = ST(dim_input=3, num_outputs=1, dim_output=10,
               num_inds=64, dim_hidden=64, num_heads=8, dtype=jnp.bfloat16)

    rng = np.random.default_rng(0)
    waves = (0.1 * rng.standard_normal((B, L))).astype(np.float32)
    lengths = np.full((B,), min(220500, L), np.int32)
    params = model.init(jax.random.key(0), jnp.zeros((1, 16, 3)))

    base_fn = make_temporal_classifier(model, cfg, use_fused_st=fused)
    if mesh_n > 1:
        from jax.sharding import PartitionSpec as P
        try:
            from jax import shard_map
        except ImportError:  # older jax
            from jax.experimental.shard_map import shard_map

        from pcaudio.parallel import make_mesh

        mesh = make_mesh(n_data=mesh_n)
        try:
            smapped = shard_map(base_fn, mesh=mesh,
                                in_specs=(P(), P("data"), P("data")),
                                out_specs=P("data"), check_vma=False)
        except TypeError:  # older shard_map spells it check_rep
            smapped = shard_map(base_fn, mesh=mesh,
                                in_specs=(P(), P("data"), P("data")),
                                out_specs=P("data"), check_rep=False)
        fn = jax.jit(smapped)
    else:
        fn = jax.jit(base_fn)

    dwaves = jax.device_put(jnp.asarray(waves))
    dlengths = jax.device_put(jnp.asarray(lengths))

    # Robustness ladder: the headline config rides three Pallas kernels; if
    # one fails to compile on this backend (remote Mosaic toolchains vary),
    # fall back stepwise to pure-XLA configs so the bench always reports a
    # number, flagged with the config that actually ran.
    fallbacks = [
        {},                                               # headline config
        {"extraction": "approx"},                         # skip select kernel
        {"extraction": "approx", "featurize": "xla"},     # skip featurize
        {"extraction": "approx", "featurize": "xla", "fused": False},
    ]
    dt = None
    for i, fb in enumerate(fallbacks):
        try:
            if fb:
                extraction = fb.get("extraction", extraction)
                featurize = fb.get("featurize", featurize)
                fused = fb.get("fused", fused)
                cfg = make_cfg(extraction)
                base_fn = make_temporal_classifier(model, cfg,
                                                   use_fused_st=fused)
                fn = jax.jit(base_fn)
            dt = _time(fn, params, dwaves, dlengths, iters=iters)
            if i:
                print(json.dumps({"warning": "bench fell back", "level": i,
                                  "config_override": fb}), file=sys.stderr)
            break
        except Exception as e:  # pragma: no cover - backend-dependent
            if mesh_n > 1 or i == len(fallbacks) - 1:
                raise
            print(json.dumps({"warning": f"bench config failed: "
                              f"{type(e).__name__}", "level": i}),
                  file=sys.stderr)
    clips_per_sec = B / dt

    out = {
        "metric": "e2e_wave_to_class_throughput",
        "value": round(clips_per_sec, 1),
        "unit": "clips/sec/chip",
        "vs_baseline": round(clips_per_sec / 10000.0, 4),
        "config": {"batch": B, "top_k": top_k, "extraction": extraction,
                   "featurize": featurize, "fused_st": fused,
                   "stft_precision": stft_precision,
                   "compute_dtype": compute_dtype, "mesh": mesh_n},
    }

    if stages and mesh_n == 1:
      try:
        # stage attribution + the other extraction mode, same shapes
        jext = jax.jit(lambda w, l: extract_chunk_clouds(w, l, cfg).
                       __getitem__(0).points)
        ext_ms = _time(jext, dwaves, dlengths, iters=iters) * 1e3
        cloud, _ = jax.jit(lambda w, l: extract_chunk_clouds(w, l, cfg))(
            dwaves, dlengths)
        pts = jax.device_put(cloud.points)
        msk = jax.device_put(cloud.mask)
        if fused:
            from pcaudio.ops.kernels.fused_st import fused_st_forward

            # mask=None matches the actual serving call (pipeline._chunk_logits
            # drops invalid chunks via the chunk-mask weighting instead); the
            # masked kernel is ~4x slower and timing it here overstated
            # st_forward by ~45 ms in BENCH_r03.  block_b must also match the
            # serving config — the default-block kernel made the r4 stage rows
            # sum over e2e once st_block_b diverged from the kernel default
            st_kw = ({} if cfg.st_block_b is None
                     else {"block_b": cfg.st_block_b})
            jst = jax.jit(lambda p, x, m: fused_st_forward(
                p, x, None, num_heads=model.num_heads, **st_kw))
        else:
            jst = jax.jit(lambda p, x, m: model.apply(p, x, mask=m))
        st_ms = _time(jst, params, pts, msk, iters=iters) * 1e3
        other = "exact" if extraction == "approx" else "approx"
        ofn = jax.jit(make_temporal_classifier(model, make_cfg(other),
                                               use_fused_st=fused))
        odt = _time(ofn, params, dwaves, dlengths, iters=iters)
        out["stage_ms"] = {"featurize_extract": round(ext_ms, 1),
                           "st_forward": round(st_ms, 1),
                           "e2e": round(dt * 1e3, 1)}
        out[f"{other}_clips_per_sec"] = round(B / odt, 1)
      except Exception as e:  # pragma: no cover - stage timings are optional
        print(json.dumps({"warning": "stage attribution failed: "
                          f"{type(e).__name__}"}), file=sys.stderr)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
