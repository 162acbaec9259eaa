"""Temporal half of the CLI cycle: 3ST + CNNTemp sweeps on the real chip.

Round 3 ran the framewise half (FST/FB) end-to-end but cut the temporal
sweeps at round end (artifacts/cli_cycle/cycle_wall_times.json).  This
runs exactly those missing stages — 3ST expt1+expt2+rebut and CNNTemp
expt1+expt2 against the SHIPPED reference checkpoints
(/root/reference/Code/model_saves) on a synthetic ESC-shaped corpus —
through the real CLI, then regenerates all five paper figures now that
every architecture's JSONs exist.

Matches the reference surface: Code/pc_temp3d_eval.py:56-200,
Code/baseline_temp_eval.py:53-197, Code/rebut_expts.py:92-140,
Code/paper_plots/plots.py.

Usage: python scripts/run_temporal_cycle.py [--out /tmp/pcaudio_cycle]
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

    # one CLI call per experiment, skipping finished outputs — a worker
    # crash mid-sweep costs one stage, and reruns resume where they stopped
    outputs = {"expt1": ["{t}_expt1.json"],
               "expt2": ["{t}_randK_expt2.json", "{t}_maxK_expt2.json"],
               "rebut": ["3ST_rebut_expt_randK.json", "3ST_rebut_expt_maxK.json"]}
    for tag, expts in (("3ST", ["expt1", "expt2", "rebut"]),
                       ("CNNTemp", ["expt1", "expt2"])):
        cfg = sorted(glob.glob(f"{REF}/{tag}(*_config.json"))[0]
        pth = cfg.replace("_config.json", "_net.pth")
        for expt in expts:
            if all(os.path.exists(os.path.join(results, o.format(t=tag)))
                   for o in outputs[expt]):
                print(f"[cycle] eval_{tag}_{expt}: already done, skipping",
                      flush=True)
                continue
            run(f"eval_{tag}_{expt}",
                ["eval", "--config", cfg, "--pth", pth,
                 "--experiments", expt, "--out-dir", results] + esc, times)

    # the committed framewise JSONs complete the set for all five figures
    for p in sorted(glob.glob("/root/repo/artifacts/cli_cycle/paper_plots/*.json")):
        dst = os.path.join(results, os.path.basename(p))
        if not os.path.exists(dst):
            import shutil
            shutil.copy(p, dst)
    run("plots", ["plots", "--results-dir", results, "--out-dir", figures],
        times)

    times["total"] = round(sum(times.values()), 1)
    print(json.dumps({"temporal_cycle_wall_s": times,
                      "artifacts": {"results": results, "figures": figures}}),
          flush=True)


if __name__ == "__main__":
    main()
