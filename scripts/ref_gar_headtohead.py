"""Head-to-head: reference GAR/CIGAR (torch CPU) vs this framework.

Reproduces the reference's GAR sweep protocol
(`/root/reference/Experiments/GAR_Non_Aligned/exp_non_aligned.py:43-123`:
seeds x n_high {4,8,16,32}, n_train=100, n_test=100, max_iter=100,
SE kernels, rmse/nrmse/r2/nll/time rows) on IDENTICAL data for both
frameworks, on two data classes:

  * scalar zoo pairs (what exp_non_aligned actually loads); and
  * generated Poisson tensor fields, non-aligned (8,16) grids — the GAR
    paper's data class (the reference's field npy outputs are absent from
    its snapshot, SURVEY.md §2.7).

The reference code runs verbatim except for three shipped bugs that make
it crash before producing numbers (each guarded minimally, matching the
round-1 AR rerun policy):
  1. `GAR.py:121` / `CIGAR.py:126`: `y_residual_var.detach()` on None in
     subset mode at the final iteration;
  2. `GAR.py:29`: stage-0 HOGP built with data_shape_list[i+1] (the high
     grid) — crashes the stage-0 likelihood whenever grids are non-aligned;
  3. `gp_computation_pack.py:156-158` (`Tensor_linear.forward`): the mode
     loop rebuilds y from the ORIGINAL x each iteration, so only the last
     mode map is applied — shape mismatch crash on any >=2-mode
     non-aligned lift (verified: (n,8,8)->(n,8,16) instead of (n,16,16));
     guarded to accumulate over modes;
  4. `CIGAR.py:75` (forward, fidelity>0): `var_res = var_low.diag()...` —
     uses the PREVIOUS stage's (already-expanded, non-square) variance
     instead of the residual GP's, crashing every multi-output CIGAR
     forward (the reference's own CIGAR demo needs npy data absent from
     its snapshot, so this path was never run); guarded to use the
     residual GP's variance like the stage-0 branch does;
  5. tensorly is not installed in this image: a minimal torch-backed stub
     provides {set_backend, ones, tensor_to_vec, tucker_to_tensor,
     tenalg.mode_dot, tenalg.multi_mode_dot}.

Run on CPU: JAX_PLATFORMS=cpu python scripts/ref_gar_headtohead.py
Writes exp_results/headtohead/<case>/<framework>_<method>_seed_<s>.csv
and prints a BASELINE.md-ready markdown table.
"""

import os
import sys
import time
import types

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# the axon TPU plugin overrides the JAX_PLATFORMS env var at import; force
# CPU via the config API before any device use (tests/conftest.py pattern)
jax.config.update("jax_platforms", "cpu")

import numpy as np
import torch


# ---------------------------------------------------------------- tensorly stub
def _install_tensorly_stub():
    def mode_dot(tensor, matrix, mode):
        t = torch.movedim(tensor, mode, 0)
        shape = t.shape
        out = matrix @ t.reshape(shape[0], -1)
        return torch.movedim(out.reshape((matrix.shape[0],) + shape[1:]), 0, mode)

    def multi_mode_dot(tensor, matrices, modes=None):
        if modes is None:
            modes = range(len(matrices))
        out = tensor
        for m, mat in zip(modes, matrices):
            out = mode_dot(out, mat, m)
        return out

    def tucker_to_tensor(core_factors):
        core, factors = core_factors
        return multi_mode_dot(core, factors)

    tl = types.ModuleType("tensorly")
    tl.set_backend = lambda *_a, **_k: None
    tl.ones = lambda shape, device=None: torch.ones(shape, device=device)
    tl.tensor_to_vec = lambda t: t.reshape(-1)
    tl.tucker_to_tensor = tucker_to_tensor
    tenalg = types.ModuleType("tensorly.tenalg")
    tenalg.mode_dot = mode_dot
    tenalg.multi_mode_dot = multi_mode_dot
    tl.tenalg = tenalg
    sys.modules["tensorly"] = tl
    sys.modules["tensorly.tenalg"] = tenalg


def _load_patched_reference():
    """Import reference GAR/CIGAR with the three crash guards applied."""
    _install_tensorly_stub()
    sys.path.insert(0, "/root/reference")
    import importlib

    def load_module(name, path, patches):
        src = open(path).read()
        for old, new in patches:
            assert old in src, (path, old)
            src = src.replace(old, new)
        mod = types.ModuleType(name)
        mod.__file__ = path
        sys.modules[name] = mod
        exec(compile(src, path, "exec"), mod.__dict__)
        return mod

    detach_guard = (
        "y=[y_residual_mean.detach(), y_residual_var.detach()])",
        "y=[y_residual_mean.detach(), y_residual_var.detach() "
        "if y_residual_var is not None else None])",
    )
    shape_guard = (
        "k = i + 1 if i < len(data_shape_list) - 1 else len(data_shape_list) - 1",
        "k = i  # guarded: stage-i HOGP models fidelity-i data/residual "
        "(shipped off-by-one crashes on non-aligned grids)",
    )
    # Tensor_linear mode-loop guard (bug 3): patch the class in the shared
    # gp_computation_pack module BEFORE GAR/CIGAR import it.
    import GaussianProcess.gp_computation_pack as gcp
    import tensorly as _tl

    def _tl_forward(self, x):
        y = x
        for i in range(len(self.l_shape)):
            y = _tl.tenalg.mode_dot(y, self.vectors[i], i + 1)
        return y

    gcp.Tensor_linear.forward = _tl_forward

    gar = load_module(
        "ref_gar", "/root/reference/FidelityFusion_Models/GAR.py",
        [detach_guard, shape_guard],
    )
    cigar_var_guard = (
        "var_res = var_low.diag().unsqueeze(dim=1).expand_as(mean_res)",
        "var_res = var_res.diag().unsqueeze(dim=1).expand_as(mean_res) "
        "if var_res.shape[0] == var_res.shape[1] else var_res",
    )
    cigar = load_module(
        "ref_cigar", "/root/reference/FidelityFusion_Models/CIGAR.py",
        [detach_guard, cigar_var_guard],
    )
    import GaussianProcess.kernel as ref_kernel
    from FidelityFusion_Models.MF_data import (
        MultiFidelityDataManager as RefDM,
    )

    return gar, cigar, ref_kernel, RefDM


# ---------------------------------------------------------------- fixtures
def scalar_fixture(seed, n_high, n_low=100, n_test=100, dataset="tl112"):
    from fidelityfusion_tpu.experiments.load_mfdata import load_data

    d = load_data(dataset, n_train_low=n_low, n_train_high=n_high,
                  n_test=n_test, seed=seed, subset=True)
    return (d["x_low"], d["y_low"], d["x_high"], d["y_high"],
            d["x_test"], d["y_test"])


def field_fixture(seed, n_high, n_low=100, n_test=100):
    from fidelityfusion_tpu.experiments.sweep import _field_fixture

    return _field_fixture("poisson", seed, n_low, n_high, n_test,
                          "non-aligned", (8, 16))


def aligned_field_fixture(seed, n_high, n_low=100, n_test=100):
    """GAR_Aligned protocol analog (`Experiments/GAR_Aligned/exp_aligned.py`):
    both fidelities on the fine grid (low = coarse solve upsampled)."""
    from fidelityfusion_tpu.experiments.sweep import _field_fixture

    return _field_fixture("poisson", seed, n_low, n_high, n_test,
                          "aligned", (8, 16))


# ---------------------------------------------------------------- runners
def run_reference(gar, cigar, ref_kernel, RefDM, method, fixture,
                  max_iter=100, lr=1e-3, flatten=False, n_restarts=1,
                  seed=0):
    """One reference cell at the exp_non_aligned settings
    (`exp_non_aligned.py:91-108`: SE kernel, max_iter=100, lr_init=1e-3).

    ``n_restarts > 1`` equalizes the restart budget with our framework
    (VERDICT r2 item 8): restart r perturbs every parameter of the fresh
    model by seeded N(0, 0.3) noise before training (best-of-R fixed-init
    perturbations with the reference's own optimizer), and the winner is
    selected by TEST RMSE — an ORACLE selection the reference could never
    actually make (our framework selects by training NLML), so the
    restarts-equalized reference column is an UPPER BOUND on any real
    restart policy.  Beating it is conservative evidence."""
    from fidelityfusion_tpu.experiments.metrics import calculate_metrix

    x_low, y_low, x_high, y_high, x_test, y_test = [
        torch.tensor(np.asarray(a), dtype=torch.float32) for a in fixture
    ]
    if flatten:
        y_low = y_low.reshape(len(y_low), -1)
        y_high = y_high.reshape(len(y_high), -1)
    shapes = [tuple(y_low.shape[1:]), tuple(y_high.shape[1:])]
    t0 = time.time()
    best_row = None
    for r in range(n_restarts):
        dm = RefDM([
            {"fidelity_indicator": 0, "raw_fidelity_name": "0",
             "X": x_low, "Y": y_low},
            {"fidelity_indicator": 1, "raw_fidelity_name": "1",
             "X": x_high, "Y": y_high},
        ])
        torch.manual_seed(1000 * seed + r)
        ks = [ref_kernel.SquaredExponentialKernel() for _ in range(2)]
        if method == "GAR":
            model = gar.GAR(2, ks, shapes)
        else:
            model = cigar.CIGAR(2, ks, shapes)
        if r > 0:
            with torch.no_grad():
                for p in model.parameters():
                    p.add_(torch.randn_like(p) * 0.3)
        try:
            if method == "GAR":
                gar.train_GAR(model, dm, max_iter=max_iter, lr_init=lr)
            else:
                cigar.train_CIGAR(model, dm, max_iter=max_iter, lr_init=lr)
            with torch.no_grad():
                xt = dm.normalizelayer[1].normalize_x(x_test)
                mean, var = model(dm, xt)
                mean, var = dm.normalizelayer[1].denormalize(mean, var)
            mean = mean.numpy()
            var = np.abs(var.numpy()).reshape(len(mean), -1)
            row = calculate_metrix(np.asarray(y_test).reshape(len(mean), -1),
                                   mean.reshape(len(mean), -1), var)
        except Exception as e:
            # a crashed restart (the reference's eigh fails to converge /
            # NaNs on several perturbed inits) is skipped, as any real
            # restart policy would; if ALL restarts crash the cell fails.
            print(f"  [restart {r}] crashed: {e!r}", flush=True)
            continue
        if not np.isfinite(row["rmse"]):
            continue
        if best_row is None or row["rmse"] < best_row["rmse"]:
            best_row = row
    if best_row is None:
        raise RuntimeError("every restart crashed or was non-finite")
    best_row["time"] = time.time() - t0
    return best_row


def run_ours(method, fixture, max_iter=100, lr=5e-2, n_restarts=4,
             flatten=False):
    import jax.numpy as jnp

    from fidelityfusion_tpu.experiments.metrics import calculate_metrix
    from fidelityfusion_tpu.experiments.sweep import _build_model, _pred_var
    from fidelityfusion_tpu.models.data_manager import MultiFidelityDataManager

    x_low, y_low, x_high, y_high, x_test, y_test = [
        np.asarray(a, np.float32) for a in fixture
    ]
    if flatten:
        y_low = y_low.reshape(len(y_low), -1)
        y_high = y_high.reshape(len(y_high), -1)
    dm = MultiFidelityDataManager([
        {"raw_fidelity_name": "0", "fidelity_indicator": 0,
         "X": x_low, "Y": y_low},
        {"raw_fidelity_name": "1", "fidelity_indicator": 1,
         "X": x_high, "Y": y_high},
    ])
    model, train_fn = _build_model(method, y_low, y_high, True,
                                   x_low.shape[1])
    t0 = time.time()
    train_fn(model, dm, max_iter=max_iter, lr_init=lr, n_restarts=n_restarts)
    mean, cov = model.forward(dm, jnp.asarray(x_test, jnp.float32))
    elapsed = time.time() - t0
    mean = np.asarray(mean)
    row = calculate_metrix(y_test.reshape(len(mean), -1),
                           mean.reshape(len(mean), -1),
                           _pred_var(method, cov))
    row["time"] = elapsed
    return row


def main():
    import csv

    gar, cigar, ref_kernel, RefDM = _load_patched_reference()
    outdir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "exp_results", "headtohead")
    seeds = [int(s) for s in os.environ.get("SEEDS", "0,1,2,3,4").split(",")]
    ref_restarts = int(os.environ.get("REF_RESTARTS", "4"))
    n_high_grid = [4, 8, 16, 32]
    all_cases = {
        "tl112_scalar": (scalar_fixture, False),
        "poisson_nonaligned": (field_fixture, "cigar_only_flatten"),
        "poisson_aligned": (aligned_field_fixture, "cigar_only_flatten"),
    }
    case_names = os.environ.get("CASES", ",".join(all_cases)).split(",")
    cases = [(c,) + all_cases[c] for c in case_names]
    frameworks = os.environ.get(
        "FRAMEWORKS", "reference,reference_r%d,ours" % ref_restarts
    ).split(",")
    summary = {}
    for case_name, fixture_fn, flatten_mode in cases:
        for method in ("GAR", "CIGAR"):
            flatten = (flatten_mode == "cigar_only_flatten"
                       and method == "CIGAR") or flatten_mode is True
            for framework in frameworks:
                for seed in seeds:
                    torch.manual_seed(seed)
                    records = []
                    for n_high in n_high_grid:
                        fixture = fixture_fn(seed, n_high)
                        try:
                            if framework.startswith("reference"):
                                r = (ref_restarts
                                     if framework != "reference" else 1)
                                row = run_reference(
                                    gar, cigar, ref_kernel, RefDM, method,
                                    fixture, flatten=flatten, n_restarts=r,
                                    seed=seed)
                            else:
                                row = run_ours(method, fixture,
                                               flatten=flatten)
                        except Exception as e:  # record crashes honestly
                            row = {"rmse": float("nan"), "nrmse": float("nan"),
                                   "r2": float("nan"), "nll": float("nan"),
                                   "time": float("nan"),
                                   "error": repr(e)[:120]}
                            print(f"FAIL {case_name} {framework} {method} "
                                  f"seed{seed} n{n_high}: {e!r}", flush=True)
                        row["train_sample_num"] = n_high
                        records.append(row)
                        key = (case_name, method, framework, n_high)
                        summary.setdefault(key, []).append(row["rmse"])
                        print(f"{case_name} {framework:9s} {method:5s} "
                              f"seed{seed} n{n_high:2d}: rmse "
                              f"{row['rmse']:.4f} ({row['time']:.1f}s)",
                              flush=True)
                    d = os.path.join(outdir, case_name)
                    os.makedirs(d, exist_ok=True)
                    with open(os.path.join(
                            d, f"{framework}_{method}_seed_{seed}.csv"),
                            "w", newline="") as f:
                        w = csv.DictWriter(
                            f, fieldnames=["train_sample_num", "rmse",
                                           "nrmse", "r2", "nll", "time"],
                            extrasaction="ignore")
                        w.writeheader()
                        w.writerows(records)

    print("\n### Markdown summary (mean RMSE over seeds)\n")
    header = "| case | method | n_high | " + " | ".join(
        f"{fw} RMSE" for fw in frameworks) + " |"
    print(header)
    print("|" + "---|" * (3 + len(frameworks)))
    for case_name, _, _ in cases:
        for method in ("GAR", "CIGAR"):
            for n_high in n_high_grid:
                vals = [
                    np.nanmean(summary.get((case_name, method, fw, n_high),
                                           [float("nan")]))
                    for fw in frameworks
                ]
                print(f"| {case_name} | {method} | {n_high} | "
                      + " | ".join(f"{v:.4f}" for v in vals) + " |")


if __name__ == "__main__":
    main()
