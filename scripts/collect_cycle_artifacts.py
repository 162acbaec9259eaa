"""Collect CLI-cycle artifacts into artifacts/cli_cycle/ for the record.

Copies the result JSONs + whatever figures exist from a (possibly
partial) `scripts/run_cli_cycle.py` output dir, writes the measured
stage wall-times, and — when only the framewise architectures have
completed — renders the two framewise paper figures directly (the
`plots` CLI stage needs all four architectures' JSONs).

Usage: python scripts/collect_cycle_artifacts.py --cycle-dir /tmp/pcaudio_cycle \
    --wall-times '{"corpus_gen": 10.7, ...}'
"""
import argparse
import glob
import json
import os
import shutil


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cycle-dir", default="/tmp/pcaudio_cycle")
    ap.add_argument("--out", default="artifacts/cli_cycle")
    ap.add_argument("--wall-times", default="{}")
    args = ap.parse_args()

    results = os.path.join(args.cycle_dir, "paper_plots")
    figures = os.path.join(args.cycle_dir, "figures")
    os.makedirs(os.path.join(args.out, "paper_plots"), exist_ok=True)
    os.makedirs(os.path.join(args.out, "figures"), exist_ok=True)

    jsons = sorted(glob.glob(os.path.join(results, "*.json")))
    for p in jsons:
        shutil.copy(p, os.path.join(args.out, "paper_plots"))
    for p in sorted(glob.glob(os.path.join(figures, "*.pdf"))):
        shutil.copy(p, os.path.join(args.out, "figures"))

    have = {os.path.basename(p) for p in jsons}
    framewise_e1 = {"FB_expt1.json", "FST_expt1.json"} <= have
    framewise_e2 = {"FST_randK_expt2.json", "FST_maxK_expt2.json",
                    "FB_randK_expt2.json", "FB_maxK_expt2.json"} <= have
    if not glob.glob(os.path.join(args.out, "figures", "*.pdf")):
        from pcaudio.eval.plots import plot_expt1_pair, plot_expt2_pair

        p = lambda n: os.path.join(results, n)
        o = lambda n: os.path.join(args.out, "figures", n)
        if framewise_e1:
            plot_expt1_pair(p("FB_expt1.json"), p("FST_expt1.json"),
                            baseline_title="FB", set_title="FST",
                            train_window=2048, xlim=(1000, 4200),
                            out_path=o("framewise_N_Fs_varying.pdf"))
        if framewise_e2:
            plot_expt2_pair(p("FST_randK_expt2.json"), p("FST_maxK_expt2.json"),
                            p("FB_randK_expt2.json"), p("FB_maxK_expt2.json"),
                            ntot=1024, set_title="FST", baseline_title="FB",
                            out_path=o("framewise_subsampling.pdf"))

    wall = json.loads(args.wall_times)
    with open(os.path.join(args.out, "cycle_wall_times.json"), "w") as f:
        json.dump(wall, f, indent=1)
    print("collected:", sorted(os.listdir(os.path.join(args.out, "paper_plots"))),
          sorted(os.listdir(os.path.join(args.out, "figures"))))


if __name__ == "__main__":
    main()
