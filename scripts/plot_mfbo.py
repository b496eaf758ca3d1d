"""Render the MFBO head-to-head figures from the recorded CSVs
(`exp_results/mfbo_headtohead/`, `exp_results/mfbo_continuous_headtohead/`):
mean cost-vs-incumbent curve per framework:acq with seed bands
(`MFBO_continuous/graphs.py` style).  Writes
exp_results/figures/mfbo_{discrete,continuous}_headtohead.png."""

import csv
import os
from collections import defaultdict

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIGDIR = os.path.join(ROOT, "exp_results", "figures")


def load(dirname):
    """{(framework, acq): [per-seed (cost[], inc[])]}"""
    out = defaultdict(list)
    d = os.path.join(ROOT, "exp_results", dirname)
    for fname in sorted(os.listdir(d)):
        if not fname.endswith(".csv"):
            continue
        stem = fname[:-4]
        fw_acq, _, _seed = stem.rpartition("_seed_")
        fw, _, acq = fw_acq.partition("_")
        cost, inc = [], []
        with open(os.path.join(d, fname)) as f:
            for row in csv.DictReader(f):
                cost.append(float(row["cost"]))
                inc.append(float(row["incumbent"]))
        out[(fw, acq)].append((np.asarray(cost), np.asarray(inc)))
    return out


def plot(dirname, title, outname):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    data = load(dirname)
    fig, ax = plt.subplots(figsize=(6.5, 4.5))
    for (fw, acq), runs in sorted(data.items()):
        n = min(len(c) for c, _ in runs)
        costs = np.stack([c[:n] for c, _ in runs])
        incs = np.stack([i[:n] for _, i in runs])
        style = "--" if fw == "reference" else "-"
        (ln,) = ax.plot(costs.mean(0), incs.mean(0), style, marker="o",
                        markersize=3, label=f"{fw}:{acq}")
        ax.fill_between(costs.mean(0), incs.mean(0) - incs.std(0),
                        incs.mean(0) + incs.std(0), alpha=0.12,
                        color=ln.get_color())
    ax.set_xlabel("cumulative cost")
    ax.set_ylabel("incumbent (best observed top-fidelity y)")
    ax.set_title(title)
    ax.legend(fontsize=7)
    fig.tight_layout()
    os.makedirs(FIGDIR, exist_ok=True)
    fig.savefig(os.path.join(FIGDIR, outname), dpi=150)
    print("wrote", outname)


def main():
    plot("mfbo_headtohead",
         "MFBO discrete (Forrester, power-10 cost, 5 seeds)",
         "mfbo_discrete_headtohead.png")
    plot("mfbo_continuous_headtohead",
         "MFBO continuous (Branin, cost 10^(z+1), 5 seeds)",
         "mfbo_continuous_headtohead.png")


if __name__ == "__main__":
    main()
