"""Sweep-result aggregation + figures.

TPU-native re-design of the reference's per-experiment plotting scripts
(`Experiments/*/pic_*.py`, `MFBO_continuous/graphs.py`, ~480 LoC of
copy-pasted CSV->matplotlib code): one generic aggregator over the sweep
harness's CSV layout (`<outdir>/<dataset>/<method>_seed_<s>.csv`) producing
the reference's figure types — metric vs n_high with seed error bars, and
cost-vs-incumbent BO curves.
"""

from __future__ import annotations

import csv
import glob
import os
import re
from collections import defaultdict
from typing import Dict, List, Optional, Sequence

import numpy as np


def load_sweep_results(outdir: str, dataset: str) -> Dict[str, Dict[int, List[dict]]]:
    """{method: {seed: [row dicts sorted by n_high]}}."""
    out: Dict[str, Dict[int, List[dict]]] = defaultdict(dict)
    for path in glob.glob(os.path.join(outdir, dataset, "*_seed_*.csv")):
        m = re.match(r"(.+)_seed_(\d+)\.csv$", os.path.basename(path))
        if not m:
            continue
        method, seed = m.group(1), int(m.group(2))
        with open(path) as f:
            rows = [
                {k: float(v) for k, v in row.items()}
                for row in csv.DictReader(f)
            ]
        out[method][seed] = sorted(rows, key=lambda r: r["n_high"])
    return dict(out)


def aggregate_metric(
    results: Dict[str, Dict[int, List[dict]]], metric: str = "rmse"
):
    """{method: (n_high array, mean array, std array)} over seeds."""
    agg = {}
    for method, seeds in results.items():
        by_n = defaultdict(list)
        for rows in seeds.values():
            for r in rows:
                by_n[r["n_high"]].append(r[metric])
        ns = np.array(sorted(by_n))
        mean = np.array([np.mean(by_n[n]) for n in ns])
        std = np.array([np.std(by_n[n]) for n in ns])
        agg[method] = (ns, mean, std)
    return agg


def plot_metric_vs_nhigh(
    outdir: str,
    dataset: str,
    metric: str = "rmse",
    save_to: Optional[str] = None,
    log_y: bool = True,
):
    """The GAR-paper-style figure: metric vs hi-fid count, one line per
    method, seed std as error band (`Experiments/Readme.md:5-17`)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    agg = aggregate_metric(load_sweep_results(outdir, dataset), metric)
    fig, ax = plt.subplots(figsize=(6, 4))
    for method, (ns, mean, std) in sorted(agg.items()):
        ax.plot(ns, mean, marker="o", label=method)
        ax.fill_between(ns, mean - std, mean + std, alpha=0.2)
    ax.set_xlabel("high-fidelity training samples")
    ax.set_ylabel(metric)
    if log_y and metric in ("rmse", "nrmse"):
        ax.set_yscale("log")
    ax.set_title(dataset)
    ax.legend()
    fig.tight_layout()
    if save_to:
        fig.savefig(save_to, dpi=150)
    return fig


def plot_bo_records(
    records_by_method: Dict[str, Sequence[dict]],
    save_to: Optional[str] = None,
):
    """Cost-vs-incumbent mean curves with seed bands
    (`MFBO_continuous/graphs.py` style)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(6, 4))
    for method, records in sorted(records_by_method.items()):
        curves = [np.asarray(r["incumbents"]) for r in records]
        n = min(len(c) for c in curves)
        stack = np.stack([c[:n] for c in curves])
        cost = np.asarray(records[0]["cost"])[:n]
        mean = stack.mean(axis=0)
        std = stack.std(axis=0)
        ax.plot(cost, mean, marker="o", label=method)
        ax.fill_between(cost, mean - std, mean + std, alpha=0.2)
    ax.set_xlabel("cumulative cost")
    ax.set_ylabel("incumbent")
    ax.legend()
    fig.tight_layout()
    if save_to:
        fig.savefig(save_to, dpi=150)
    return fig
