"""Head-to-head: reference CAR/ContinuAR (torch CPU) vs this framework.

Reproduces the reference's three CAR experiment protocols on IDENTICAL
data for both frameworks (the last reference experiment family with no
recorded evidence, round-3 verdict item 1):

  * car-subset   (`/root/reference/Experiments/CAR_Subset/exp_car.py:18-77`):
    lo-fid train size n in {32,64,96,128}, hi-fid = sorted dec_rate=0.75
    subset OF THE LO-FID ROWS; y_low = sin(x) - U*0.2, y_high = sin(x) -
    U*0.1, x ~ U[0,20] from a 500-point pool; 100 test points on a grid.
  * car-nonsubset (`CAR_Non_Subset/exp_car.py:18-77`): same sizes but the
    hi-fid x drawn INDEPENDENTLY from the pool — the overlap the staged
    residual trains on is the random index intersection (tiny: E[|ov|] =
    n_low*n_high/500, can be 0 at n=32).
  * car-cost     (`CAR_Cost/exp_car.py:36-87`): random cells n_low ~
    U{64..127}, n_high = n_low - U{0..63}, independent draws; cost =
    n_high recorded per cell.

NOTE on reference seeding: the reference scripts call ``random.seed(_seed)``
but draw every tensor with the UNSEEDED torch global RNG
(`CAR_Subset/exp_car.py:27-40`), so their shipped protocol is not actually
reproducible.  This harness generates each fixture once in seeded numpy
and feeds the identical arrays to both frameworks — the comparison is
paired per cell.

Frameworks/methods per cell:
  * reference CAR      — `ContinuousAutoRegression` + `train_CAR`
    (`FidelityFusion_Models/CAR_ContinuousAutoRegression.py:72-143`) run
    verbatim (per-epoch carriage-return prints silenced — pure stdout
    noise, no behavior change).
  * reference CAR_large — `ContinuousAutoRegression_large`
    (`CAR_ContinuousAutoRegression_Large.py:88-143`); one documented
    guard: its `from MF_data import ...` only resolves when the models
    dir itself is on sys.path (layout drift, SURVEY §2.6 note) — patched
    to the package-qualified import.  Run at the staged protocol's
    max_iter/lr.
  * reference *_r4     — restarts-equalized columns (round-2 policy from
    the GAR head-to-head): R=4 seeded N(0,0.3) parameter perturbations of
    the fresh model, winner selected by TEST RMSE — an ORACLE selection
    the reference could never make, so this column is an UPPER BOUND on
    any real reference restart policy; beating it is conservative.
  * ours CAR           — `models/car.py:ContinuousAutoRegression` +
    `train_CAR` (n_restarts=4, NLML-selected — no oracle).
  * ours CAR_large     — `models/car.py:ContinuousAutoRegressionLarge`
    (single fit; its PSD feature-map joint kernel replaces the
    reference's indefinite two-sample MC integral).

Any cell where a framework crashes or returns non-finite metrics is
recorded as NaN with the error string — crashes are data, not exclusions.

Run on CPU:  JAX_PLATFORMS=cpu python scripts/ref_car_headtohead.py
Env knobs:   SEEDS=0,1,2,3,4  PROTOCOLS=subset,nonsubset,cost
             FRAMEWORKS=reference,reference_r4,ours  MAXITER=100
Writes exp_results/car/<protocol>/<framework>_<method>_seed_<s>.csv and
prints a BASELINE.md-ready markdown table.
"""

import os
import sys
import time
import types

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import torch


# ------------------------------------------------------------- reference load
def _load_module(name, path, patches):
    src = open(path).read()
    for old, new in patches:
        assert old in src, (path, old)
        src = src.replace(old, new)
    mod = types.ModuleType(name)
    mod.__file__ = path
    sys.modules[name] = mod
    exec(compile(src, path, "exec"), mod.__dict__)
    return mod


def _load_reference():
    # FidelityFusion_Models/__init__ imports CIGAR -> tensorly (absent
    # from this image); install the GAR harness's torch-backed stub
    from ref_gar_headtohead import _install_tensorly_stub

    _install_tensorly_stub()
    sys.path.insert(0, "/root/reference")
    silence_staged = [
        ("print('fidelity {}, epoch {}/{}, nll: {}'.format(i_fidelity, i+1,"
         " max_iter, loss.item()), end='\\r')", "pass"),
        ("print('fidelity {}, epoch {}/{},b {}, nll: {}'.format(i_fidelity,"
         " i+1, max_iter,CARmodel.b.item(), loss.item()), end='\\r')",
         "pass"),
    ]
    car = _load_module(
        "ref_car",
        "/root/reference/FidelityFusion_Models/CAR_ContinuousAutoRegression.py",
        silence_staged,
    )
    large_patches = [
        # layout-drift guard: MF_data only importable package-qualified
        ("from MF_data import MultiFidelityDataManager",
         "from FidelityFusion_Models.MF_data import MultiFidelityDataManager"),
        ("print('fidelity:', i_fidelity, 'iter', i,"
         " 'nll:{:.5f}'.format(loss.item()))", "pass"),
    ]
    car_large = _load_module(
        "ref_car_large",
        "/root/reference/FidelityFusion_Models/"
        "CAR_ContinuousAutoRegression_Large.py",
        large_patches,
    )
    import GaussianProcess.kernel as ref_kernel
    from FidelityFusion_Models.MF_data import (
        MultiFidelityDataManager as RefDM,
    )

    return car, car_large, ref_kernel, RefDM


# ------------------------------------------------------------------ fixtures
def _pool_fixture(rng, n_low, n_high, subset):
    """The CAR papers' noisy-sin construction (`CAR_Subset/exp_car.py:28-42`):
    both fidelities drawn from ONE 500-point pool so non-subset draws still
    intersect (the staged residual trains on that intersection)."""
    x_all = (rng.random((500, 1)) * 20).astype(np.float32)
    lo_idx = np.sort(rng.permutation(500)[:n_low])
    x_low = x_all[lo_idx]
    if subset:
        x_high = x_low[np.sort(rng.permutation(n_low)[:n_high])]
    else:
        x_high = x_all[np.sort(rng.permutation(500)[:n_high])]
    y_low = np.sin(x_low) - rng.random((n_low, 1)).astype(np.float32) * 0.2
    y_high = np.sin(x_high) - rng.random((n_high, 1)).astype(np.float32) * 0.1
    x_test = np.linspace(0, 20, 100, dtype=np.float32).reshape(-1, 1)
    return x_low, y_low, x_high, y_high, x_test, np.sin(x_test)


def subset_fixture(seed, n):
    rng = np.random.default_rng(seed)
    return _pool_fixture(rng, n, int(0.75 * n), subset=True)


def nonsubset_fixture(seed, n):
    rng = np.random.default_rng(seed)
    return _pool_fixture(rng, n, int(0.75 * n), subset=False)


def cost_fixture(seed):
    """One random (n_low, n_high) cell (`CAR_Cost/exp_car.py:33-49`)."""
    rng = np.random.default_rng(seed)
    n_low = int(rng.integers(64, 128))
    n_high = n_low - int(rng.integers(0, 64))
    return _pool_fixture(rng, n_low, n_high, subset=False), n_high


# ------------------------------------------------------------------- runners
def _metrics(y_test, mean, var):
    from fidelityfusion_tpu.experiments.metrics import calculate_metrix

    mean = np.asarray(mean, np.float64).reshape(len(y_test), -1)
    var = np.abs(np.asarray(var, np.float64))
    if var.ndim == 2 and var.shape[0] == var.shape[1]:
        var = np.diag(var)
    var = var.reshape(len(y_test), -1)
    if var.shape[1] != mean.shape[1]:
        var = np.broadcast_to(var[:, :1], mean.shape)
    return calculate_metrix(
        np.asarray(y_test).reshape(len(y_test), -1), mean, var
    )


def run_reference(car, car_large, ref_kernel, RefDM, method, fixture,
                  max_iter, lr, n_restarts, seed):
    x_low, y_low, x_high, y_high, x_test, y_test = [
        torch.tensor(np.asarray(a), dtype=torch.float32) for a in fixture
    ]
    t0 = time.time()
    best = None
    for r in range(n_restarts):
        dm = RefDM([
            {"fidelity_indicator": 0, "raw_fidelity_name": "0",
             "X": x_low, "Y": y_low},
            {"fidelity_indicator": 1, "raw_fidelity_name": "1",
             "X": x_high, "Y": y_high},
        ])
        torch.manual_seed(1000 * seed + r)
        try:
            if method == "CAR":
                ks = [ref_kernel.ARDKernel(1) for _ in range(2)]
                model = car.ContinuousAutoRegression(
                    fidelity_num=2, kernel_list=ks, b_init=1.0)
                train_fn = car.train_CAR
            else:
                kx = ref_kernel.ARDKernel(1)
                model = car_large.ContinuousAutoRegression_large(
                    fidelity_num=2, kernel_x=kx, b_init=1.0)
                train_fn = car_large.train_CAR
            if r > 0:
                with torch.no_grad():
                    for p in model.parameters():
                        p.add_(torch.randn_like(p) * 0.3)
            train_fn(model, dm, max_iter=max_iter, lr_init=lr)
            with torch.no_grad():
                mean, var = model(dm, x_test)
            row = _metrics(y_test.numpy(), mean.numpy(), var.numpy())
        except Exception as e:
            print(f"  [ref {method} restart {r}] crashed: {e!r}", flush=True)
            continue
        if not np.isfinite(row["rmse"]):
            continue
        # ORACLE selection (test RMSE) — documented upper bound
        if best is None or row["rmse"] < best["rmse"]:
            best = row
    if best is None:
        raise RuntimeError("every reference restart crashed/non-finite")
    best["time"] = time.time() - t0
    return best


def run_ours(method, fixture, max_iter, lr, n_restarts):
    import jax.numpy as jnp

    from fidelityfusion_tpu.models.car import (
        ContinuousAutoRegression, ContinuousAutoRegressionLarge,
        train_CAR, train_CAR_large,
    )
    from fidelityfusion_tpu.models.data_manager import MultiFidelityDataManager
    from fidelityfusion_tpu.ops.kernels import ARDKernel

    x_low, y_low, x_high, y_high, x_test, y_test = [
        np.asarray(a, np.float32) for a in fixture
    ]
    dm = MultiFidelityDataManager([
        {"raw_fidelity_name": "0", "fidelity_indicator": 0,
         "X": x_low, "Y": y_low},
        {"raw_fidelity_name": "1", "fidelity_indicator": 1,
         "X": x_high, "Y": y_high},
    ])
    t0 = time.time()
    if method == "CAR":
        model = ContinuousAutoRegression(
            2, [ARDKernel() for _ in range(2)], input_dim=1)
        train_CAR(model, dm, max_iter=max_iter, lr_init=lr,
                  n_restarts=n_restarts)
    else:
        model = ContinuousAutoRegressionLarge(
            2, ARDKernel(), input_dim=1)
        train_CAR_large(model, dm, max_iter=max_iter, lr_init=lr)
    mean, cov = model.forward(dm, jnp.asarray(x_test, jnp.float32))
    row = _metrics(y_test, np.asarray(mean), np.asarray(cov))
    row["time"] = time.time() - t0
    return row


# ---------------------------------------------------------------------- main
def main():
    import csv

    car, car_large, ref_kernel, RefDM = _load_reference()
    outdir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "exp_results", "car")
    seeds = [int(s) for s in os.environ.get("SEEDS", "0,1,2,3,4").split(",")]
    max_iter = int(os.environ.get("MAXITER", "100"))
    ref_restarts = int(os.environ.get("REF_RESTARTS", "4"))
    protocols = os.environ.get(
        "PROTOCOLS", "subset,nonsubset,cost").split(",")
    frameworks = os.environ.get(
        "FRAMEWORKS", "reference,reference_r%d,ours" % ref_restarts
    ).split(",")
    methods = os.environ.get("METHODS", "CAR,CAR_large").split(",")
    train_sizes = [32, 64, 96, 128]
    # reference protocol lr: 1e-2 (`CAR_Subset/exp_car.py:56`)
    lr = 1e-2
    summary = {}

    def one_cell(framework, method, fixture, seed):
        if framework.startswith("reference"):
            r = ref_restarts if framework != "reference" else 1
            return run_reference(car, car_large, ref_kernel, RefDM,
                                 method, fixture, max_iter, lr, r, seed)
        return run_ours(method, fixture, max_iter, lr, n_restarts=4)

    for protocol in protocols:
        d = os.path.join(outdir, protocol)
        os.makedirs(d, exist_ok=True)
        for method in methods:
            for framework in frameworks:
                for seed in seeds:
                    records = []
                    if protocol == "cost":
                        # 5 cells per CSV (`CAR_Cost/exp_car.py:31`);
                        # disjoint cell-seed blocks per CSV seed
                        cells = [(f"cost", s)
                                 for s in range(10 * seed + 1, 10 * seed + 6)]
                    else:
                        cells = [(n, seed) for n in train_sizes]
                    for cell_id, cell_seed in cells:
                        if protocol == "subset":
                            fixture = subset_fixture(cell_seed, cell_id)
                            xcol, xval = "train_sample_num", cell_id
                        elif protocol == "nonsubset":
                            fixture = nonsubset_fixture(cell_seed, cell_id)
                            xcol, xval = "train_sample_num", cell_id
                        else:
                            fixture, n_high = cost_fixture(cell_seed)
                            xcol, xval = "cost", n_high
                        try:
                            row = one_cell(framework, method, fixture,
                                           cell_seed)
                        except Exception as e:
                            row = {k: float("nan") for k in
                                   ("rmse", "nrmse", "r2", "nll", "time")}
                            row["error"] = repr(e)[:120]
                            print(f"FAIL {protocol} {framework} {method} "
                                  f"seed{seed} cell{cell_id}: {e!r}",
                                  flush=True)
                        row[xcol] = xval
                        records.append(row)
                        summary.setdefault(
                            (protocol, method, framework, xval
                             if protocol != "cost" else "all"),
                            []).append(row["rmse"])
                        print(f"{protocol:9s} {framework:13s} {method:9s} "
                              f"seed{seed} {xcol}={xval}: rmse "
                              f"{row['rmse']:.4f} ({row['time']:.1f}s)",
                              flush=True)
                    with open(os.path.join(
                            d, f"{framework}_{method.lower()}_seed_"
                               f"{seed}.csv"), "w", newline="") as f:
                        w = csv.DictWriter(
                            f, fieldnames=[xcol, "rmse", "nrmse", "r2",
                                           "nll", "time"],
                            extrasaction="ignore")
                        w.writeheader()
                        w.writerows(records)

    print("\n### Markdown summary (mean RMSE over seeds; NaN-aware)\n")
    header = ("| protocol | method | cell | "
              + " | ".join(f"{fw}" for fw in frameworks) + " |")
    print(header)
    print("|" + "---|" * (3 + len(frameworks)))
    cells_by_proto = {
        "subset": train_sizes, "nonsubset": train_sizes, "cost": ["all"],
    }
    for protocol in protocols:
        for method in methods:
            for cell in cells_by_proto[protocol]:
                vals = [np.nanmean(summary.get(
                    (protocol, method, fw, cell), [float("nan")]))
                    for fw in frameworks]
                print(f"| {protocol} | {method} | {cell} | "
                      + " | ".join(f"{v:.4f}" for v in vals) + " |")


if __name__ == "__main__":
    main()
