"""Verify drive: exact+fused serving pipeline vs pure-XLA path (real TPU).

Loads the shipped reference 3ST checkpoint, classifies a synthetic batch
through (a) the production path — fused Pallas featurize, exact-select
Pallas kernel, fused v6 ST — and (b) the pure-XLA reference-semantics
path, then asserts identical classifications and reports logit deltas.
"""
import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from pcaudio.checkpoint.torch_import import load_torch_state_dict, st_params
    from pcaudio.data.synthetic import synth_clip
    from pcaudio.eval.pipeline import TemporalPipelineConfig, make_temporal_classifier
    from pcaudio.nn import ST

    sd = load_torch_state_dict(
        "/root/reference/Code/model_saves/3ST(2021-04-27 05_14_06.922134)_net.pth")
    params = st_params(sd)
    model = ST(dim_input=3, num_outputs=1, dim_output=10,
               num_inds=64, dim_hidden=64, num_heads=8, dtype=jnp.bfloat16)

    B, n = 64, 220500
    waves = np.stack([synth_clip(i % 10, i // 10, n=n) for i in range(B)])
    pad = (-n) % 1024
    waves = np.pad(waves, ((0, 0), (0, pad))).astype(np.float32)
    lengths = np.full((B,), n, np.int32)

    def run(extraction, featurize, fused_st, exact_kernel=None):
        cfg = TemporalPipelineConfig(
            fs=44100, n_fft=1024, num_frames=10, top_k=128,
            extraction=extraction, featurize=featurize,
            stft_precision="default", compute_dtype="bfloat16",
            exact_kernel=exact_kernel)
        fn = jax.jit(make_temporal_classifier(model, cfg,
                                              use_fused_st=fused_st))
        return np.asarray(fn(params, jnp.asarray(waves),
                             jnp.asarray(lengths)))

    prod = run("exact", "fused", True)            # select kernel + v6 ST
    ref = run("exact", "xla", False)              # pure XLA chain
    agree = (prod.argmax(-1) == ref.argmax(-1)).mean()
    delta = np.abs(prod - ref).max()
    print(f"vs XLA chain      — argmax agreement: {agree:.4f}  "
          f"max|dlogit|: {delta:.2e}")
    print(f"label histogram prod: {np.bincount(prod.argmax(-1), minlength=10)}")
    print(f"label histogram ref : {np.bincount(ref.argmax(-1), minlength=10)}")
    assert agree == 1.0, "production path changed classifications"

    # Controlled comparison: IDENTICAL pipeline numerics, only the selection
    # implementation swapped (Pallas exact-select kernel vs the two-stage
    # XLA exact top-k).  Same point set → deltas are summation-order only.
    ctl = run("exact", "fused", True, exact_kernel=False)
    agree_k = (prod.argmax(-1) == ctl.argmax(-1)).mean()
    delta_k = np.abs(prod - ctl).max()
    print(f"vs XLA top-k only — argmax agreement: {agree_k:.4f}  "
          f"max|dlogit|: {delta_k:.2e}")
    assert agree_k == 1.0, "select kernel changed classifications"
    assert delta_k < 2e-2, f"select-kernel logit delta: {delta_k}"
    print("OK")


if __name__ == "__main__":
    main()
