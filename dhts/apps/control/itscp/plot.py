"""Aggregate ITSCP training results across trials into a mean±std plot.

Parity: reference ``plot_itscp.py:1-73`` — read each trial's ``eval.txt``
(one negative-reward value per eval point), aggregate mean±std across
trials, plot on a shared axis.

Run: ``python -m dhts.apps.control.itscp.plot <run_dir> [more run_dirs...]``
where each run dir contains ``trial_*/eval.txt``.
"""

from __future__ import annotations

import argparse
import glob
import os

import numpy as np


def load_run(run_dir):
    trials = []
    for path in sorted(glob.glob(os.path.join(run_dir, "trial_*",
                                              "eval.txt"))):
        with open(path) as f:
            vals = [float(line) for line in f if line.strip()]
        if vals:
            trials.append(vals)
    if not trials:
        return None
    n = min(len(t) for t in trials)
    return np.asarray([t[:n] for t in trials])


def main(argv=None):
    ap = argparse.ArgumentParser("Aggregate ITSCP eval curves")
    ap.add_argument("runs", nargs="+", help="run dirs with trial_*/eval.txt")
    ap.add_argument("--out", default="itscp_plot.png")
    args = ap.parse_args(argv)

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    plt.figure(figsize=(10, 7))
    for run in args.runs:
        arr = load_run(run)
        if arr is None:
            print(f"warning: no eval.txt under {run}")
            continue
        x = np.arange(1, arr.shape[1] + 1)
        mean, std = arr.mean(0), arr.std(0)
        plt.plot(x, mean, label=os.path.basename(os.path.normpath(run)),
                 linewidth=2.5)
        plt.fill_between(x, mean - std, mean + std, alpha=0.2)
    plt.xlabel("Evaluation")
    plt.ylabel("Loss (negative reward)")
    plt.legend()
    plt.grid(alpha=0.3)
    plt.savefig(args.out, dpi=110, bbox_inches="tight")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
