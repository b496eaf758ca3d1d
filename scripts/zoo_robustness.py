"""Zoo-wide robustness sweep (VERDICT r2 item 6).

The reference enumerates every fidelity pair of the 41-function zoo
(`/root/reference/Experiments/Load_Mfdata.py:289-326`); round 2's worst
bug class (noise-free zoo datasets NaN'ing at predict time) was found by
accident on one dataset.  This sweep proves every (function, fidelity
pair, model, seed, subset-mode) cell trains and predicts FINITELY:

    all zoo families x all fidelity pairs x {AR, NAR, ResGP}
      x seeds {0, 1} x {subset, nonsubset}

with reduced budgets (n_low=48, n_high=16, n_test=64, 60 Adam iters,
2 restarts — robustness evidence, not accuracy evidence).  Shapes are
held constant across cells so jit caches are reused (one compile per
(model, x_dim)).

Writes exp_results/zoo_robustness/cells.csv (one row per cell: finite
flags + rmse/r2) and prints a summary.  Exit code 1 if any cell is
non-finite or crashes.
"""

import csv
import os
import sys
import time
import traceback

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from fidelityfusion_tpu.data.zoo import ZOO
from fidelityfusion_tpu.experiments.load_mfdata import all_fidelity_pairs
from fidelityfusion_tpu.experiments.sweep import run_single

# round 3 ran AR/NAR/ResGP (cells.csv); round 4 adds CAR/GAR/CIGAR
# (cells_car_gar_cigar.csv) — the remaining N-fidelity models facing the
# zoo's noise-free/ill-conditioned datasets (VERDICT r3 item 5).  CAR
# trains its residual on the fidelity overlap in BOTH modes (the
# reference's only CAR training path, `CAR...py:133`); GAR/CIGAR lift
# scalar zoo outputs as (1,) tensor shapes.
MODELS = tuple(os.environ.get("MODELS", "AR,NAR,ResGP").split(","))
SEEDS = (0, 1)
OUT_NAME = os.environ.get("OUT", "cells.csv")


def main():
    outdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "exp_results", "zoo_robustness")
    os.makedirs(outdir, exist_ok=True)
    rows, n_bad = [], 0
    datasets = [p for base in sorted(ZOO) for p in all_fidelity_pairs(base)]
    print(f"{len(datasets)} fidelity-pair datasets x {len(MODELS)} models "
          f"x {len(SEEDS)} seeds x 2 subset modes "
          f"= {len(datasets)*len(MODELS)*len(SEEDS)*2} cells", flush=True)
    t_start = time.time()
    for di, dataset in enumerate(datasets):
        for method in MODELS:
            for seed in SEEDS:
                for subset in (True, False):
                    cell = {
                        "dataset": dataset, "method": method, "seed": seed,
                        "subset": int(subset),
                    }
                    try:
                        row = run_single(
                            method, dataset, seed, n_high=16, n_low=48,
                            n_test=64, subset=subset, max_iter=60,
                            n_restarts=2,
                        )
                        finite = all(
                            np.isfinite(row[k]) for k in ("rmse", "r2", "nll")
                        )
                        cell.update(
                            rmse=f"{row['rmse']:.6g}", r2=f"{row['r2']:.4f}",
                            nll=f"{row['nll']:.4f}", finite=int(finite),
                            error="",
                        )
                        if not finite:
                            n_bad += 1
                    except Exception as e:
                        cell.update(rmse="", r2="", nll="", finite=0,
                                    error=f"{type(e).__name__}: {e}")
                        n_bad += 1
                        traceback.print_exc()
                    rows.append(cell)
        done = (di + 1) * len(MODELS) * len(SEEDS) * 2
        print(f"[{di+1}/{len(datasets)}] {dataset}: {done} cells, "
              f"{n_bad} bad, {time.time()-t_start:.0f}s", flush=True)

    path = os.path.join(outdir, OUT_NAME)
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)
    print(f"wrote {path}: {len(rows)} cells, {n_bad} non-finite/crashed",
          flush=True)
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
