"""Converged train-from-scratch round-trip (VERDICT r3 task 6).

Exercises L4 -> checkpoint -> torch-export -> REFERENCE-code eval the way
the reference's own artifacts were produced (Code/settransformer.py:96-162
trains, Code/pceval.py:23-47 reloads and evaluates):

  phase "train":  `pcaudio.cli train FST` on the synthetic ESC-shaped
                  corpus to convergence (chip; orbax checkpoints).
  phase "verify": load the orbax checkpoint, export a reference-convention
                  `.pth` (module.-prefixed DataParallel state_dict), load
                  it with the ACTUAL reference torch code (importlib of
                  /root/reference/Code/models.py), evaluate BOTH stacks on
                  the identical test-split clouds, and assert equal
                  accuracy + argmax agreement.  Runs on CPU f32 so the
                  two stacks are numerically comparable.

Usage:
  python scripts/train_export_roundtrip.py train  [--epochs 300] [--out DIR]
  python scripts/train_export_roundtrip.py verify [--out DIR] [--report FILE]
"""
import argparse
import importlib.util
import json
import os
import subprocess
import sys
import time

CORPUS = "/tmp/pcaudio_roundtrip/corpus"  # v2 spread-spectrum signature:
# the v1 cycle corpus is class-separable on the bin grid but near-degenerate
# in cloud coordinates (see pcaudio/data/synthetic.py::synth_clip) — the
# reference ST recipe sits at chance on it for 50k+ steps, so a converged
# round-trip needs the v2 signature.
OUT = "/tmp/pcaudio_roundtrip"


def load_module(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def ensure_corpus():
    csv = os.path.join(CORPUS, "esc50.csv")
    if not os.path.exists(csv):
        from pcaudio.data.synthetic import generate_esc_corpus
        generate_esc_corpus(CORPUS, clips_per_class=40)
    return csv, os.path.join(CORPUS, "audio", "")


def phase_train(args):
    csv, audio = ensure_corpus()
    t0 = time.perf_counter()
    r = subprocess.run(
        [sys.executable, "-m", "pcaudio.cli", "train", "FST",
         "--esc-csv", csv, "--esc-audio", audio,
         "--epochs", str(args.epochs),
         "--checkpoint-every", "50",
         "--out-dir", os.path.join(args.out, "model_saves")],
        cwd="/root/repo")
    print(f"[roundtrip] train: {time.perf_counter() - t0:.0f}s "
          f"rc={r.returncode}", flush=True)
    assert r.returncode == 0


def phase_verify(args):
    import jax
    jax.config.update("jax_platforms", "cpu")  # f32 exactness vs torch
    import jax.numpy as jnp
    import numpy as np
    import torch

    from pcaudio.checkpoint.orbax_io import load_checkpoint
    from pcaudio.checkpoint.torch_export import save_pth, st_state_dict
    from pcaudio.data.esc import load_esc_split_waves
    from pcaudio.nn import ST
    from pcaudio.train import RECIPES, prepare_framewise_data

    tree, cfg, step = load_checkpoint(os.path.join(args.out, "model_saves"))
    if cfg is None:
        cfg = RECIPES["FST"]()
    params = tree
    while isinstance(params, dict) and "params" in params:
        params = params["params"]  # unwrap {"params": {"params": inner}}
    print(f"[roundtrip] loaded step {step}", flush=True)

    pth = os.path.join(args.out, "model_saves", "FST_roundtrip_net.pth")
    save_pth(st_state_dict(params), pth)
    print(f"[roundtrip] exported {pth}", flush=True)

    csv, audio = ensure_corpus()
    waves, lengths, labels = load_esc_split_waves(
        csv, audio, cfg.numpy_seed, split="test")
    data = prepare_framewise_data(waves, lengths, labels, cfg, as_clouds=True)
    X, y = data["points"].astype(np.float32), data["labels"]
    if args.max_frames:
        X, y = X[:args.max_frames], y[:args.max_frames]
    print(f"[roundtrip] test clouds: {X.shape}", flush=True)

    # pcaudio stack (CPU f32 jit)
    model = ST(dim_input=2, num_outputs=1, dim_output=10, num_inds=64,
               dim_hidden=64, num_heads=8)
    fwd = jax.jit(lambda p, x: model.apply(p, x))
    preds_j = []
    for i in range(0, len(X), 512):
        preds_j.append(np.asarray(
            jnp.argmax(fwd({"params": params}, jnp.asarray(X[i:i + 512])), -1)))
    preds_j = np.concatenate(preds_j)
    acc_j = float((preds_j == y).mean())

    # reference torch stack, loading the EXPORTED .pth exactly like
    # Code/pceval.py:45-47 (DataParallel wrapper carries the module. prefix)
    sys.path.insert(0, "/root/reference/set_transformer-master")
    ref_models = load_module("ref_code_models", "/root/reference/Code/models.py")
    tmodel = ref_models.ST(dim_input=2, num_outputs=1, dim_output=10,
                           num_inds=64, dim_hidden=64, num_heads=8, ln=False)
    tmodel = torch.nn.DataParallel(tmodel)
    tmodel.load_state_dict(torch.load(pth, map_location="cpu"))
    tmodel.eval()
    preds_t = []
    with torch.no_grad():
        for i in range(0, len(X), 512):
            preds_t.append(
                tmodel(torch.from_numpy(X[i:i + 512])).argmax(-1).numpy())
    preds_t = np.concatenate(preds_t)
    acc_t = float((preds_t == y).mean())

    agree = float((preds_j == preds_t).mean())
    report = {"step": int(step), "n_test_frames": int(len(X)),
              "acc_pcaudio": round(acc_j, 4), "acc_reference_torch": round(acc_t, 4),
              "argmax_agreement": round(agree, 6), "pth": pth}
    print(json.dumps(report), flush=True)
    if args.report:
        os.makedirs(os.path.dirname(args.report), exist_ok=True)
        with open(args.report, "w") as f:
            json.dump(report, f, indent=1)
    assert agree > 0.999, f"stacks disagree: {agree}"
    assert abs(acc_j - acc_t) < 1e-3, (acc_j, acc_t)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("phase", choices=["train", "verify"])
    ap.add_argument("--epochs", type=int, default=300)
    ap.add_argument("--out", default=OUT)
    ap.add_argument("--report", default="")
    ap.add_argument("--max-frames", type=int, default=0,
                    help="cap test frames (smoke runs); 0 = all")
    args = ap.parse_args()
    if args.phase == "train":
        phase_train(args)
    else:
        phase_verify(args)


if __name__ == "__main__":
    main()
