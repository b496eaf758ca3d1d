"""Rebuild the GAR/CIGAR head-to-head markdown table from the CSVs in
exp_results/headtohead/ (mean RMSE over seeds, one column per framework)."""

import csv
import glob
import os
import re
import sys

import numpy as np


def main():
    base = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "exp_results", "headtohead")
    frameworks = ["reference", "reference_r4", "ours"]
    data = {}
    cases = sorted(os.listdir(base))
    for case in cases:
        for path in glob.glob(os.path.join(base, case, "*.csv")):
            m = re.match(r"(reference_r\d+|reference|ours)_(\w+)_seed_(\d+)",
                         os.path.basename(path))
            if not m:
                continue
            fw, method, seed = m.group(1), m.group(2), int(m.group(3))
            for row in csv.DictReader(open(path)):
                key = (case, method, fw, int(row["train_sample_num"]))
                data.setdefault(key, []).append(float(row["rmse"]))

    print("| case | method | n_high | " + " | ".join(
        f"{fw} RMSE" for fw in frameworks) + " |")
    print("|" + "---|" * (3 + len(frameworks)))
    for case in cases:
        for method in ("GAR", "CIGAR"):
            for n_high in (4, 8, 16, 32):
                vals = [
                    np.nanmean(data.get((case, method, fw, n_high),
                                        [float("nan")]))
                    for fw in frameworks
                ]
                print(f"| {case} | {method} | {n_high} | "
                      + " | ".join(f"{v:.4f}" for v in vals) + " |")


if __name__ == "__main__":
    main()
