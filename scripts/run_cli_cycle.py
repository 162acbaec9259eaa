"""Full CLI cycle on the synthetic ESC-shaped corpus, wall-times measured.

Proves the harness end-to-end at real scale on the real chip without
ESC-50 audio (docs/ACCURACY.md keeps the one-command path to swap in the
real data): generate corpus → ``pcaudio.cli train`` (short run) →
``pcaudio.cli eval`` expt1+expt2 sweeps with imported REFERENCE
checkpoints (FST framewise + 3ST temporal) → ``pcaudio.cli plots``.
Each stage runs the actual CLI in a subprocess; wall-times are printed as
one JSON line and artifacts land in --out (default /tmp/pcaudio_cycle).

Usage: python scripts/run_cli_cycle.py [--epochs 50] [--out DIR]
"""
import argparse
import glob
import json
import os
import subprocess
import sys
import time

REF = "/root/reference/Code/model_saves"


def run(tag, argv, times, env=None):
    t0 = time.perf_counter()
    e = dict(os.environ)
    if env:
        e.update(env)
    r = subprocess.run([sys.executable, "-m", "pcaudio.cli"] + argv,
                       env=e, cwd="/root/repo")
    dt = time.perf_counter() - t0
    times[tag] = round(dt, 1)
    print(f"[cycle] {tag}: {dt:.1f}s (rc={r.returncode})", flush=True)
    assert r.returncode == 0, f"{tag} failed"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=50)
    ap.add_argument("--clips-per-class", type=int, default=40)
    ap.add_argument("--out", default="/tmp/pcaudio_cycle")
    args = ap.parse_args()

    times = {}
    t0 = time.perf_counter()
    from pcaudio.data.synthetic import generate_esc_corpus
    csv, audio = generate_esc_corpus(os.path.join(args.out, "corpus"),
                                     clips_per_class=args.clips_per_class)
    times["corpus_gen"] = round(time.perf_counter() - t0, 1)
    print(f"[cycle] corpus: {csv} ({times['corpus_gen']}s)", flush=True)

    esc = ["--esc-csv", csv, "--esc-audio", audio]
    results = os.path.join(args.out, "paper_plots")
    figures = os.path.join(args.out, "figures")

    run("train_FST", ["train", "FST"] + esc +
        ["--epochs", str(args.epochs),
         "--out-dir", os.path.join(args.out, "model_saves")], times)

    # all four reference architectures (plots.generate_all needs every
    # JSON); 3ST additionally runs the rebuttal importance-sampling sweep
    for tag, expts in (("FST", ["expt1", "expt2"]),
                       ("FB", ["expt1", "expt2"]),
                       ("3ST", ["expt1", "expt2", "rebut"]),
                       ("CNNTemp", ["expt1", "expt2"])):
        cfg = sorted(glob.glob(f"{REF}/{tag}(*_config.json"))[0]
        pth = cfg.replace("_config.json", "_net.pth")
        run(f"eval_{tag}", ["eval", "--config", cfg, "--pth", pth,
                            "--experiments", *expts,
                            "--out-dir", results] + esc, times)

    run("plots", ["plots", "--results-dir", results, "--out-dir", figures],
        times)

    times["total"] = round(sum(times.values()), 1)
    print(json.dumps({"cycle_wall_s": times,
                      "epochs": args.epochs,
                      "artifacts": {"results": results, "figures": figures}}),
          flush=True)


if __name__ == "__main__":
    main()
