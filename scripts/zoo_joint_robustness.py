"""Zoo robustness for the JOINT training path (`models/joint.py`).

Rounds 3-4 swept all six staged trainers over every zoo fidelity pair
(zoo_robustness.py: AR/NAR/ResGP then CAR/GAR/CIGAR, 0 non-finite).
The legacy-stack JOINT trainer (`train_joint` / `train_joint_nonsubset`
— one Adam scan over all stage losses, per-round re-imputation in
nonsubset mode; `MFGP_ver2023May/AR_AutoRegression.py:180-203`) is the
one trainer family no sweep has faced, and it shares none of the staged
path's restart ladders or per-stage rollback.  Same cell structure:

    all zoo fidelity pairs x {AR, NAR, ResGP, CAR (+ GAR/CIGAR via
    MODELS=GAR,CIGAR — the round-5 tensor-model joint path, written to
    cells_joint_gar_cigar.csv)} x seed 0 x {subset, nonsubset}

reduced budgets (n_low=48, n_high=16, 60 iters).  Writes
exp_results/zoo_robustness/cells_joint.csv; exit 1 on any non-finite.

Run: python scripts/zoo_joint_robustness.py
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

import jax.numpy as jnp
import numpy as np

from fidelityfusion_tpu.data.zoo import ZOO
from fidelityfusion_tpu.experiments.load_mfdata import all_fidelity_pairs
from fidelityfusion_tpu.experiments.metrics import calculate_metrix
from fidelityfusion_tpu.experiments.sweep import _build_model, load_data
from fidelityfusion_tpu.models.data_manager import MultiFidelityDataManager
from fidelityfusion_tpu.models.joint import train_joint

MODELS = tuple(os.environ.get("MODELS", "AR,NAR,ResGP,CAR").split(","))
SEED = 0


def one_cell(method, dataset, subset):
    data = load_data(dataset, n_train_low=48, n_train_high=16, n_test=64,
                     seed=SEED, subset=subset)
    dm = MultiFidelityDataManager([
        {"raw_fidelity_name": "0", "fidelity_indicator": 0,
         "X": data["x_low"], "Y": data["y_low"]},
        {"raw_fidelity_name": "1", "fidelity_indicator": 1,
         "X": data["x_high"], "Y": data["y_high"]},
    ])
    model, _ = _build_model(method, data["y_low"], data["y_high"], subset,
                            data["x_dim"])
    train_joint(model, dm, max_iter=60, lr_init=1e-2, rounds=2)
    mean, cov = model.forward(dm, jnp.asarray(data["x_test"], jnp.float32))
    mean = np.asarray(mean)
    var = np.asarray(jnp.diagonal(cov) if np.asarray(cov).ndim == 2
                     else cov)
    row = calculate_metrix(data["y_test"], mean, var)
    row["finite"] = int(np.all(np.isfinite(mean)) and np.all(np.isfinite(var)))
    return row


def main():
    outdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "exp_results", "zoo_robustness")
    os.makedirs(outdir, exist_ok=True)
    datasets = [p for base in sorted(ZOO) for p in all_fidelity_pairs(base)]
    print(f"{len(datasets)} pairs x {len(MODELS)} models x 2 modes",
          flush=True)
    rows, n_bad = [], 0
    t_start = time.time()
    for di, dataset in enumerate(datasets):
        for method in MODELS:
            for subset in (True, False):
                if method == "CAR" and not subset:
                    # documented API contract: non-subset joint CAR raises
                    # TypeError("use CARLarge") — the joint ContinuAR
                    # formulation IS CARLarge (models/joint.py:285)
                    continue
                cell = {"dataset": dataset, "method": method,
                        "seed": SEED, "subset": int(subset)}
                try:
                    r = one_cell(method, dataset, subset)
                    cell.update({k: round(float(v), 4)
                                 for k, v in r.items() if k != "finite"})
                    cell["finite"] = r["finite"]
                    cell["error"] = ""
                except Exception as e:
                    cell.update({"finite": 0, "error": repr(e)[:120]})
                    traceback.print_exc()
                if not cell["finite"]:
                    n_bad += 1
                rows.append(cell)
        print(f"[{di+1}/{len(datasets)}] {dataset}: {len(rows)} cells, "
              f"{n_bad} bad, {time.time()-t_start:.0f}s", flush=True)
    suffix = ""
    if os.environ.get("MODELS"):
        suffix = "_" + "_".join(m.lower() for m in MODELS)
    path = os.path.join(outdir, f"cells_joint{suffix}.csv")
    keys = ["dataset", "method", "seed", "subset", "rmse", "nrmse", "r2",
            "nll", "finite", "error"]
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=keys, extrasaction="ignore")
        w.writeheader()
        w.writerows(rows)
    print(f"wrote {path}: {len(rows)} cells, {n_bad} non-finite/crashed",
          flush=True)
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
