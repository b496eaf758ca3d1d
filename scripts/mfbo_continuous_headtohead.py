"""MFBO-continuous head-to-head: reference protocol on both frameworks.

Protocol (`/root/reference/Experiments/MFBO_continuous/MF_BO_continuous.py:20-136`):
Branin with continuous fidelity z in [0,1] (the b-coefficient degrades with
1-z, `Data_simulation/Synthetic_MF_Function/Branin.py:18-31`), 16 initial
points at random z, 10 BO iterations, FIDES-style joint surrogate retrained
from scratch each iteration (protocol setting MF_iterations=10, lr=1e-4),
power-10 continuous cost (`cost_pow_10.py:compute_cost`: 10^(z+1)); record
cumulative cost and the running max of ALL observed y (the continuous
protocol counts any-fidelity observations, `MF_BO_continuous.py:100`).

Reference-side runnability (documented, each item verified by running it):
  * The surrogate class the script imports (`MF_model.FiDEs` with
    `.train(x, y, s)/.predict(x, z)`) is ABSENT from the snapshot, and the
    nearest shipped component (`MFGP_ver2023May/base_gp/fides.py`) takes
    scalar fidelity-interval bounds — it cannot consume per-point
    fidelities at all.  Reconstructed here as `RefJointGP`: a GP over the
    joint [x, z] input using the reference's own `SE_kernel`
    (`MFGP_ver2023May/kernel/SE_kernel.py`) and the reference's cigp NLL /
    posterior math (`GaussianProcess/cigp_v10.py:24-69`), trained with the
    protocol's Adam settings; y normalized per the requested
    `normal_y_mode: 0` config (`MF_BO_continuous.py:47`).
  * Continuous UCB (`Continuous/MF_UCB.py`) runs as shipped on top of the
    reconstructed surrogate (its fidelity information-gap rule is
    commented out in the shipped file — z comes from the joint argmax).
  * Continuous cfKG (`Continuous/CFKG.py`) runs with the reconstructed
    surrogate (its `.train/.predict` calls match the absent API); note its
    scorer queries the TRUE objective per candidate (`CFKG.py:50-60`) —
    kept verbatim.
  * Continuous ES needs emukit (absent from this image) — recorded as
    unrunnable-as-shipped (`Continuous/ES.py:15-23`).

Ours runs UCB / ES / KG via `bo/continuous_loop.py:mf_bo_continuous` at
shipping defaults.  Both frameworks receive the reference's EXACT initial
draw (seeded np.random streams replicated), and the same power-10 cost
accounting is applied to both.  Writes
exp_results/mfbo_continuous_headtohead/*.csv + a BASELINE.md-ready table.
"""

import csv
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import torch

BO_ITERATIONS = 10
N_INIT = 16


def shared_init(seed):
    """The reference Branin's exact initial draw (`Branin.py:34-46`):
    per-dim seeded uniforms, then the fidelity column drawn from the
    CONTINUING stream of the last dim's seed (the shipped code does not
    reseed before the fidelity draw)."""
    search_range = [[-5, 10], [0, 15], [0, 1]]
    tem = []
    for i in range(2):
        np.random.seed(seed + 217 + i)
        lo, hi = search_range[i]
        tem.append(np.random.rand(N_INIT, 1) * (hi - lo) + lo)
    x = np.concatenate(tem, axis=1)
    z = np.random.rand(N_INIT, 1)  # continues the seed+218 stream
    return x, z


def branin_y(x, z):
    b = 5.1 / (4 * np.pi**2)
    c = 5 / np.pi
    r = 6.0
    t = 1 / (8 * np.pi)
    b_eff = b - 0.1 * (1 - z[:, 0])
    return (
        -((x[:, 1] - b_eff * x[:, 0] ** 2 + c * x[:, 0] - r) ** 2
          + 10 * (1 - t) * np.cos(x[:, 0]) + 10)
    ).reshape(-1, 1)


def model_cost(zs):
    """Shared power-10 continuous accounting (`cost_pow_10.py:8-13`):
    sum over all points of 10^(z+1)."""
    return float(np.sum(np.power(10.0, np.asarray(zs).reshape(-1) + 1.0)))


# ---------------------------------------------------------- reference side
class RefJointGP(torch.nn.Module):
    """Reconstruction of the absent `MF_model.FiDEs` (see module docstring):
    joint-[x, z] GP, reference SE kernel + cigp math + protocol Adam."""

    JITTER = 1e-6

    def __init__(self, input_dim, n_iterations=10, lr=1e-4, log_beta=0.1):
        super().__init__()
        sys.path.insert(0, "/root/reference")
        from MFGP_ver2023May.kernel.SE_kernel import SE_kernel

        self.kernel = SE_kernel(noise_exp_format=True, length_scale=1.0,
                                scale=1.0)
        self.log_beta = torch.nn.Parameter(torch.tensor(float(log_beta)))
        self.n_iterations = n_iterations
        self.lr = lr
        self.x = None

    def _joint(self, x, z):
        x = torch.as_tensor(np.asarray(x), dtype=torch.float32)
        z = torch.as_tensor(np.asarray(z), dtype=torch.float32).reshape(-1, 1)
        if z.shape[0] == 1 and x.shape[0] > 1:
            z = z.expand(x.shape[0], 1)
        return torch.cat([x, z], dim=1)

    def _sigma(self, xj):
        n = xj.shape[0]
        return (
            self.kernel(xj, xj)
            + (self.log_beta.exp().pow(-1) + self.JITTER) * torch.eye(n)
        )

    def train(self, xtr, ytr, s_index):
        xj = self._joint(xtr, s_index)
        y = torch.as_tensor(np.asarray(ytr), dtype=torch.float32).reshape(-1, 1)
        self.y_mean, self.y_std = y.mean(), y.std() + 1e-9  # normal_y_mode 0
        yn = (y - self.y_mean) / self.y_std
        opt = torch.optim.Adam(self.parameters(), lr=self.lr)
        for _ in range(self.n_iterations):
            opt.zero_grad()
            sigma = self._sigma(xj)
            L = torch.linalg.cholesky(sigma)
            gamma = torch.linalg.solve_triangular(L, yn, upper=False)
            nll = (
                0.5 * (gamma**2).sum()
                + L.diagonal().log().sum()
                + 0.5 * xj.shape[0] * float(np.log(2 * np.pi))
            )
            nll.backward()
            opt.step()
        self.x, self.yn = xj.detach(), yn.detach()
        return self

    def predict(self, x, z):
        with torch.no_grad():
            xq = self._joint(x, z)
            sigma = self._sigma(self.x)
            L = torch.linalg.cholesky(sigma)
            kx = self.kernel(self.x, xq)
            mean = kx.t() @ torch.cholesky_solve(self.yn, L)
            LinvKx = torch.linalg.solve_triangular(L, kx, upper=False)
            var = (
                self.kernel(xq, xq).diagonal().view(-1, 1)
                - (LinvKx**2).sum(dim=0).view(-1, 1)
                + self.log_beta.exp().pow(-1)
            )
            return mean * self.y_std + self.y_mean, var * self.y_std**2


class RefBranin:
    """Minimal stand-in exposing the reference objective interface the
    continuous cfKG expects (`Continuous/CFKG.py:40,50`)."""

    def __init__(self):
        self.search_range = [[-5, 10], [0, 15], [0, 1]]

    def get_data(self, x, s):
        x = np.asarray(x, float).reshape(-1, 2)
        z = np.broadcast_to(np.asarray(s, float).reshape(-1, 1), (len(x), 1))
        return torch.as_tensor(branin_y(x, z), dtype=torch.float32)

    def Initiate_data(self, num, seed):
        tem = []
        for i in range(2):
            np.random.seed(seed + 217 + i)
            lo, hi = self.search_range[i]
            tem.append(np.random.rand(num, 1) * (hi - lo) + lo)
        x = np.concatenate(tem, axis=1)
        z = np.random.rand(num, 1)
        return x, branin_y(x, z), z


def _load_ref_acq(name):
    import types

    path = f"/root/reference/MF_BayesianOptimization/Continuous/{name}.py"
    src = open(path).read()
    mod = types.ModuleType(f"ref_cont_{name}")
    mod.__file__ = path
    sys.modules[f"ref_cont_{name}"] = mod
    exec(compile(src, path, "exec"), mod.__dict__)
    return mod


def run_reference(acq_name, seed):
    data = RefBranin()
    x, y, z = data.Initiate_data(N_INIT, seed)
    rows = [(model_cost(z), float(np.max(y)))]
    for i in range(BO_ITERATIONS):
        t0 = time.time()
        model = RefJointGP(input_dim=3, n_iterations=10, lr=1e-4,
                           log_beta=0.1)
        model.train(x, y, z)

        if acq_name == "UCB":
            ucb = _load_ref_acq("MF_UCB")
            strat = ucb.upper_confidence_bound_continuous(
                x_dimension=2, search_range=data.search_range,
                posterior_function=model.predict, model_cost=RefCost(),
                seed=[seed + i + 1234, i],
            )
            new_x, new_s = strat.compute_next()
        elif acq_name == "cfKG":
            cfkg = _load_ref_acq("CFKG")
            shadow = RefJointGP(input_dim=3, n_iterations=10, lr=1e-4,
                                log_beta=1e-4)
            strat = cfkg.continuous_fidelity_knowledgement_gradient(
                posterior_function=model.predict, data_model=data,
                model_objective_new=shadow, model_cost=RefCost(),
                seed=seed + i + 1234, search_range=data.search_range,
            )
            new_x, new_s = strat.compute_next(x, y, z)
        else:
            raise ValueError(acq_name)
        new_x = np.asarray(new_x, float).reshape(1, 2)
        new_z = float(np.asarray(new_s).reshape(-1)[0])
        new_y = branin_y(new_x, np.full((1, 1), new_z))
        x = np.concatenate([x, new_x], axis=0)
        y = np.concatenate([y, new_y], axis=0)
        z = np.concatenate([z, np.full((1, 1), new_z)], axis=0)
        rows.append((model_cost(z), float(np.max(y))))
        print(f"ref {acq_name} seed{seed} it{i}: z={new_z:.2f} "
              f"inc={rows[-1][1]:.3f} cost={rows[-1][0]:.0f} "
              f"({time.time()-t0:.1f}s)", flush=True)
    return rows


class RefCost:
    """`cost_pow_10.cost` semantics without the repo's path surgery."""

    def compute_cost(self, z):
        if isinstance(z, np.ndarray):
            return np.power(10.0, z + 1)
        return pow(10.0, float(z))

    def compute_model_cost(self, dataset, s_index):
        return float(np.sum(np.power(10.0, np.asarray(s_index) + 1)))


# --------------------------------------------------------------- our side
def run_ours(acq_name, seed):
    from fidelityfusion_tpu.bo.continuous_loop import mf_bo_continuous
    from fidelityfusion_tpu.data.objectives import Branin

    class ProtocolCost:
        """Power-10 continuous cost shared with the reference accounting."""

        def compute_cost(self, z):
            return np.power(10.0, np.asarray(z, float) + 1.0)

    x0, z0 = shared_init(seed)
    y0 = branin_y(x0, z0)
    rec = mf_bo_continuous(
        Branin(), method=acq_name, bo_iterations=BO_ITERATIONS, seed=seed,
        init_data=(x0, y0, z0), cost=ProtocolCost(), z_min=0.0,
    )
    zs = list(z0.reshape(-1))
    rows = [(model_cost(zs), float(np.max(y0)))]
    inc = rec["incumbents"]
    for i, znew in enumerate(rec["Z"]):
        zs.append(float(znew))
        rows.append((model_cost(zs), float(inc[i])))
    return rows


def main():
    outdir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "exp_results",
        "mfbo_continuous_headtohead")
    os.makedirs(outdir, exist_ok=True)
    seeds = [int(s) for s in os.environ.get("SEEDS", "0,1,2,3,4").split(",")]
    final = {}
    for framework, acqs, runner in (
        ("reference", ("UCB", "cfKG"), run_reference),
        ("ours", ("UCB", "ES", "KG"), run_ours),
    ):
        for acq in acqs:
            for seed in seeds:
                try:
                    rows = runner(acq, seed)
                except Exception as e:
                    print(f"FAIL {framework} {acq} seed{seed}: {e!r}",
                          flush=True)
                    continue
                with open(os.path.join(
                        outdir, f"{framework}_{acq}_seed_{seed}.csv"),
                        "w", newline="") as f:
                    w = csv.writer(f)
                    w.writerow(["iteration", "cost", "incumbent"])
                    for it, (c, v) in enumerate(rows):
                        w.writerow([it, c, v])
                final.setdefault((framework, acq), []).append(rows[-1])
                print(f"{framework} {acq} seed{seed}: final inc "
                      f"{rows[-1][1]:.3f} @ cost {rows[-1][0]:.0f}",
                      flush=True)

    print("\n### Summary (mean over seeds; Branin true max ~= -0.398)\n")
    print("| framework | acq | final incumbent | final cost |")
    print("|---|---|---|---|")
    for (fw, acq), vals in final.items():
        c = np.mean([v[0] for v in vals])
        v = np.mean([v[1] for v in vals])
        print(f"| {fw} | {acq} | {v:.3f} | {c:.0f} |")
    print("\nreference ES: unrunnable as shipped (emukit absent, "
          "`Continuous/ES.py:15-23`)")


if __name__ == "__main__":
    main()
