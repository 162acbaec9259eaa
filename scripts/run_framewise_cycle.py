"""Framewise half of the CLI cycle re-run: FST + FB sweeps on the real chip
through the RANK-MASK eval engine.

The committed framewise artifacts (round 3) predate the single-program
rank-mask K-sweep engine + threaded compile prefetch that ran the round-4
temporal sweeps 3.2x faster (3ST expt1 905 s vs the comparable round-3 FST
sweep at 2,932 s).  This re-runs exactly the framewise stages — FST
expt1+expt2 and FB expt1+expt2 against the SHIPPED reference checkpoints
(/root/reference/Code/model_saves) on the synthetic ESC-shaped corpus —
through the real CLI, recording fresh wall-times, then regenerates the
figures with the full artifact set.

Matches the reference surface: Code/pceval.py:55-192,
Code/baseline_eval.py:53-183, Code/paper_plots/plots.py.

Usage: python scripts/run_framewise_cycle.py [--out /tmp/pcaudio_cycle]
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

    # one CLI call per experiment, skipping finished outputs — resumable
    outputs = {"expt1": ["{t}_expt1.json"],
               "expt2": ["{t}_randK_expt2.json", "{t}_maxK_expt2.json"]}
    for tag in ("FST", "FB"):
        cfg = sorted(glob.glob(f"{REF}/{tag}(*_config.json"))[0]
        pth = cfg.replace("_config.json", "_net.pth")
        for expt in ("expt1", "expt2"):
            if all(os.path.exists(os.path.join(results, o.format(t=tag)))
                   for o in outputs[expt]):
                print(f"[cycle] eval_{tag}_{expt}: already done, skipping",
                      flush=True)
                continue
            run(f"eval_{tag}_{expt}",
                ["eval", "--config", cfg, "--pth", pth,
                 "--experiments", expt, "--out-dir", results] + esc, times)

    # the committed temporal JSONs complete the set for all five figures
    for p in sorted(glob.glob(
            "/root/repo/artifacts/cli_cycle/paper_plots/*.json")):
        dst = os.path.join(results, os.path.basename(p))
        if not os.path.exists(dst):
            import shutil
            shutil.copy(p, dst)
    run("plots", ["plots", "--results-dir", results, "--out-dir", figures],
        times)

    times["total"] = round(sum(times.values()), 1)
    print(json.dumps({"framewise_cycle_wall_s": times,
                      "artifacts": {"results": results, "figures": figures}}),
          flush=True)


if __name__ == "__main__":
    main()
