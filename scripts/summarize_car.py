"""Summarize the CAR head-to-head CSVs (exp_results/car/*) into
BASELINE.md-ready markdown tables + figures.

Input layout (written by scripts/ref_car_headtohead.py):
  exp_results/car/<protocol>/<framework>_<method>_seed_<s>.csv
    subset/nonsubset: train_sample_num,rmse,nrmse,r2,nll,time
    cost:             cost,rmse,nrmse,r2,nll,time  (5 random cells/seed)

Prints mean RMSE per cell (NaN-aware: crashed cells count as NaN and are
reported, not dropped) and writes figures:
  exp_results/figures/car_{subset,nonsubset}_rmse.png  (rmse vs n_low)
  exp_results/figures/car_cost_rmse.png                (rmse vs cost scatter)
"""

import csv
import math
import os
import sys
from collections import defaultdict

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CARDIR = os.path.join(ROOT, "exp_results", "car")
FIGDIR = os.path.join(ROOT, "exp_results", "figures")


def load(protocol):
    """{(framework, method): [(xval, rmse, seed), ...]}"""
    out = defaultdict(list)
    d = os.path.join(CARDIR, protocol)
    if not os.path.isdir(d):
        return out
    for fname in sorted(os.listdir(d)):
        if not fname.endswith(".csv"):
            continue
        stem = fname[:-4]
        fw_method, _, seed = stem.rpartition("_seed_")
        # framework may contain '_' (reference_r4); method is the tail
        for m in ("_car_large", "_car"):
            if fw_method.endswith(m):
                fw, method = fw_method[: -len(m)], m[1:]
                break
        else:
            continue
        with open(os.path.join(d, fname)) as f:
            for row in csv.DictReader(f):
                xcol = "cost" if protocol == "cost" else "train_sample_num"
                out[(fw, method)].append(
                    (float(row[xcol]), float(row["rmse"]), int(seed))
                )
    return out


def nanmean(vals):
    return float(np.nanmean(vals)) if vals else math.nan


def table(protocol, data):
    keys = sorted(data)
    fws = sorted({fw for fw, _ in keys})
    methods = sorted({m for _, m in keys})
    if protocol == "cost":
        cells = ["all"]
    else:
        cells = sorted({x for vals in data.values() for x, _, _ in vals})
    print(f"\n#### {protocol}\n")
    print("| method | cell | " + " | ".join(fws) + " |")
    print("|---|---|" + "---|" * len(fws))
    wins = tot = 0
    for m in methods:
        for c in cells:
            row = []
            for fw in fws:
                vals = [r for x, r, _ in data.get((fw, m), [])
                        if protocol == "cost" or x == c]
                n_nan = sum(1 for v in vals if not np.isfinite(v))
                s = f"{nanmean(vals):.4f}"
                if n_nan:
                    s += f" ({n_nan} NaN)"
                row.append(s)
            ours = nanmean([r for x, r, _ in data.get(("ours", m), [])
                            if protocol == "cost" or x == c])
            refs = [nanmean([r for x, r, _ in data.get((fw, m), [])
                             if protocol == "cost" or x == c])
                    for fw in fws if fw != "ours"]
            if refs and np.isfinite(ours):
                tot += 1
                if all((not np.isfinite(r)) or ours <= r for r in refs):
                    wins += 1
            print(f"| {m} | {c} | " + " | ".join(row) + " |")
    print(f"\nours wins {wins}/{tot} cells (vs every reference column)")


def figures():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(FIGDIR, exist_ok=True)
    for protocol in ("subset", "nonsubset"):
        data = load(protocol)
        if not data:
            continue
        fig, ax = plt.subplots(figsize=(6, 4))
        for (fw, m), vals in sorted(data.items()):
            xs = sorted({x for x, _, _ in vals})
            mean = [nanmean([r for x, r, _ in vals if x == n]) for n in xs]
            std = [float(np.nanstd([r for x, r, _ in vals if x == n]))
                   for n in xs]
            ax.errorbar(xs, mean, yerr=std, marker="o", capsize=3,
                        label=f"{fw}:{m}")
        ax.set_xlabel("low-fidelity training samples")
        ax.set_ylabel("rmse")
        ax.set_yscale("log")
        ax.set_title(f"CAR {protocol} protocol (dec_rate=0.75, 5 seeds)")
        ax.legend(fontsize=7)
        fig.tight_layout()
        fig.savefig(os.path.join(FIGDIR, f"car_{protocol}_rmse.png"),
                    dpi=150)
    data = load("cost")
    if data:
        fig, ax = plt.subplots(figsize=(6, 4))
        for (fw, m), vals in sorted(data.items()):
            xs = [x for x, r, _ in vals if np.isfinite(r)]
            rs = [r for _, r, _ in vals if np.isfinite(r)]
            ax.scatter(xs, rs, s=14, label=f"{fw}:{m}", alpha=0.7)
        ax.set_xlabel("cost (n_high)")
        ax.set_ylabel("rmse")
        ax.set_yscale("log")
        ax.set_title("CAR cost protocol (25 random cells)")
        ax.legend(fontsize=7)
        fig.tight_layout()
        fig.savefig(os.path.join(FIGDIR, "car_cost_rmse.png"), dpi=150)


def main():
    for protocol in ("subset", "nonsubset", "cost"):
        data = load(protocol)
        if data:
            table(protocol, data)
        else:
            print(f"\n#### {protocol}: no CSVs")
    figures()
    print("\nfigures written to exp_results/figures/car_*.png")


if __name__ == "__main__":
    main()
