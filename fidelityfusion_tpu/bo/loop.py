"""Multi-fidelity Bayesian-optimization outer loops.

TPU-native re-design of `Experiments/MFBO_discrete/MF_BO_discrete.py:33-152`:
init design -> fit MF surrogate -> maximize acquisition (x and fidelity) ->
query objective at (x, s) -> append -> record {cost, incumbent, time}.

The surrogate is rebuilt + retrained from scratch each iteration (matching
the reference protocol, `MF_BO_discrete.py:63-76`); all inner training /
acquisition maximization runs jitted+vmapped.  The loop itself stays in
Python because it mutates the dataset (SURVEY.md §7).
"""

from __future__ import annotations

import math
import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from fidelityfusion_tpu.bo.mf_acq import DiscreteMFAcquisition, optimize_acq_mf
from fidelityfusion_tpu.bo.optimize import optimize_acqf
from fidelityfusion_tpu.models.ar import AR, train_AR
from fidelityfusion_tpu.models.resgp import ResGP, train_ResGP
from fidelityfusion_tpu.models.nar import NAR, train_NAR
from fidelityfusion_tpu.models.data_manager import MultiFidelityDataManager
from fidelityfusion_tpu.ops.kernels import SquaredExponentialKernel

MODEL_REGISTRY = {
    "AR": (AR, train_AR),
    "ResGP": (ResGP, train_ResGP),
    "NAR": (NAR, train_NAR),
}


def mf_bo_discrete(
    objective,
    method: str = "UCB",
    model_name: str = "AR",
    bo_iterations: int = 10,
    init_index: Optional[Dict[int, int]] = None,
    seed: int = 0,
    train_iters: int = 100,
    train_lr: float = 5e-2,
    acq_iterations: int = 30,
    acq_lr: float = 0.1,
    gamma: Optional[List[float]] = None,
    verbose: bool = False,
    checkpoint_path: Optional[str] = None,
    init_data=None,
    beta_floor: float = 0.0,
    cost_budget: Optional[float] = None,
) -> Dict[str, List]:
    """Discrete multi-fidelity BO (`MF_BO_discrete.py:33-152`).

    ``objective`` follows the `data/objectives.py` protocol (2 fidelities).
    Returns the record dict {cost, incumbents, operation_time, X, S}.

    ``checkpoint_path`` enables resume: the record + datasets are persisted
    after every iteration and reloaded on restart (capability the reference
    lacks — its only checkpoint is the NaN-rollback snapshot, SURVEY.md §5.4).

    ``init_data`` — optional ``(xs, ys)`` lists of per-fidelity arrays to
    use as the initial design instead of ``objective.initiate_data`` (used
    by the head-to-head scripts to inject the reference's exact draw so
    both frameworks start from identical datasets).
    """
    from fidelityfusion_tpu.utils.checkpoint import load_bo_state, save_bo_state
    import os

    init_index = init_index or {1: 10, 2: 4}
    fidelity_num = objective.total_fidelity_num
    record = {"cost": [], "incumbents": [], "operation_time": [], "X": [], "S": []}
    if checkpoint_path and os.path.exists(checkpoint_path):
        record, xs, ys = load_bo_state(checkpoint_path)
        xs, ys = list(xs), list(ys)
        if verbose:
            print(f"resumed from {checkpoint_path} at iteration {len(record['S'])}")
    elif init_data is not None:
        xs = [np.asarray(x, np.float32) for x in init_data[0]]
        ys = [np.asarray(y, np.float32).reshape(len(x), -1)
              for x, y in zip(xs, init_data[1])]
    else:
        xs, ys = objective.initiate_data(init_index, seed)
    key = jax.random.PRNGKey(seed)

    bounds = np.asarray(objective.search_range[: objective.x_dim], float)

    for it in range(len(record["S"]), bo_iterations):
        t0 = time.time()
        dm = MultiFidelityDataManager(
            [
                {
                    "raw_fidelity_name": str(i),
                    "fidelity_indicator": i,
                    "X": xs[i],
                    "Y": ys[i],
                }
                for i in range(fidelity_num)
            ]
        )
        cls, train_fn = MODEL_REGISTRY[model_name]
        kernel_list = [SquaredExponentialKernel() for _ in range(fidelity_num)]
        model = cls(
            fidelity_num,
            kernel_list,
            if_nonsubset=True,
            input_dim=objective.x_dim,
        )
        extra = {"pad_multiple": 16} if model_name == "AR" else {}
        # pad_multiple buckets stage shapes so the jitted training scans
        # compile once per bucket instead of once per BO iteration
        train_fn(model, dm, max_iter=train_iters, lr_init=train_lr, **extra)

        f_best = float(max(np.max(y) for y in ys))
        beta = 0.2 * objective.x_dim
        if method == "UCB":
            # Reference MF-GP-UCB schedule (`v1/MF_UCB.py:22-23`): beta =
            # 0.2*d*log(t+1.1) is ~0.02*d at t=0 (near-greedy early) and
            # the escalation threshold is a FIXED gamma=0.01 — so early
            # queries stay at the cheap fidelity until its posterior
            # variance at the chosen x is resolved below gamma/beta.  The
            # round-3 constant-beta / decaying-gamma ladder escalated to
            # the expensive fidelity from iteration 0 (gamma=1 at t=0
            # demands var > 5 to stay cheap), spending the early budget
            # 10x faster — the measured cost<=700 loss to reference-UCB
            # (11.61 vs 12.27, BASELINE.md).
            # ``beta_floor`` (round 5): the reference schedule is ~0 at
            # t=0 (it even truncates: log(int(1.1)) = 0, `v1/MF_UCB.py:22`)
            # -> UCB is mean-greedy exactly when the surrogate knows
            # least, the root cause of the one greedy-stuck seed each
            # framework shows on the recorded protocol (BASELINE.md).  A
            # floor keeps an exploration bonus while the log schedule
            # ramps; measured on both frameworks in
            # scripts/mfbo_headtohead.py (BETA_FLOOR env).
            beta = max(0.2 * objective.x_dim * math.log(it + 1.1),
                       beta_floor)
        if method in ("ES", "cfKG"):
            # v1-strategy methods (`MF_BayesianOptimization/Discrete/v1/
            # {MF_ES,CFKG}.py` semantics) via bo/strategies.py
            from fidelityfusion_tpu.bo.strategies import (
                CFKGStrategy,
                MFESStrategy,
            )

            def posterior_fn(x, s, model=model, dm=dm):
                m, c = model.forward(dm, jnp.asarray(x, jnp.float32),
                                     to_fidelity=s)
                c = jnp.asarray(c)
                v = jnp.diagonal(c) if c.ndim == 2 else c
                return m.reshape(-1), v.reshape(-1)

            def cost_fn(s1):
                return float(objective.cost.compute_cost(s1))

            def cross_scale_fn(s, model=model):
                # cov(f_top(x'), f_s(x)) = (prod_{j>=s} rho_j) cov_s(x', x)
                # for the rho-residual cascade (AR; ResGP has rho = 1;
                # models without rho treated as perfectly coupled).
                rhos = model.params.get("rho") if hasattr(model, "params") \
                    else None
                if not rhos:
                    return 1.0
                prod = 1.0
                for j in range(s, fidelity_num - 1):
                    prod *= float(rhos[j])
                return prod

            is_last = it == bo_iterations - 1
            if cost_budget is not None and not is_last:
                # BUDGET-AWARE cash-in (round 5; docs/bayesian_optimization
                # .md "cost-matched"): ES/cfKG rationally front-load cheap
                # information and cash in late — with a KNOWN cost ceiling
                # the cash-in must land inside it.  Once the remaining
                # budget covers at most two more top-fidelity queries,
                # further cheap information can no longer be amortized:
                # switch to cash-in mode (top-fidelity posterior argmax,
                # the is_last semantics of bo/cfkg.py).
                spent = float(objective.cost.compute_model_cost(ys))
                top_cost = float(objective.cost.compute_cost(fidelity_num))
                is_last = (cost_budget - spent) <= 2.0 * top_cost
            incumbent = float(np.max(ys[-1]))
            if method == "ES":
                strat = MFESStrategy(
                    objective.x_dim, fidelity_num, posterior_fn,
                    cost_fn=cost_fn, cross_scale_fn=cross_scale_fn,
                    seed=seed + 31 * it, is_last=is_last, bounds=bounds,
                )
            else:
                def cov_full_fn(x, s, model=model, dm=dm):
                    _, c = model.forward(
                        dm, jnp.asarray(x, jnp.float32), to_fidelity=s)
                    c = jnp.asarray(c)
                    return c if c.ndim == 2 else jnp.diag(c.reshape(-1))

                strat = CFKGStrategy(
                    objective.x_dim, fidelity_num,
                    lambda x, s: posterior_fn(x, s)[0],
                    cov_full_fn, cost_fn=cost_fn, incumbent=incumbent,
                    cross_scale_fn=cross_scale_fn, seed=seed + 77 * it,
                    bounds=bounds, n_candidates=64, is_last=is_last,
                )
            new_x, new_s = strat.compute_next()
            new_x = np.asarray(new_x, np.float32).reshape(1, -1)
            new_s = int(new_s)
        elif hasattr(model, "export_posterior"):
            # cached acquisition path: hashable posterior + score, data via
            # padded state pytrees -> one compiled ascent per (spec, method)
            # reused across BO iterations (see bo/optimize.py acq_args)
            from fidelityfusion_tpu.bo.mf_acq import MFAcqScore

            posts = [
                model.export_posterior(dm, to_fidelity=s, pad_multiple=16)
                for s in range(fidelity_num)
            ]
            f_best_j = jnp.float32(f_best)
            best_xs, best_vs = [], []
            for s, (post, state) in enumerate(posts):
                if method == "UCB":
                    # score in the export's normalized-y space — the same
                    # space the fidelity gate below uses (ADVICE r4: a
                    # raw-space argmax weights var by y_std^2 vs the
                    # reference's normalized maximization)
                    score_s = MFAcqScore(
                        post, method=method, beta=beta,
                        y_shift=float(state["y_norm"][0]),
                        y_scale=float(state["y_norm"][1]),
                    )
                else:
                    score_s = MFAcqScore(post, method=method, beta=beta)
                x_s, v_s = optimize_acqf(
                    score_s,
                    jnp.asarray(bounds, jnp.float32),
                    jax.random.fold_in(jax.random.fold_in(key, it), s),
                    raw_samples=16,
                    steps=acq_iterations,
                    lr=acq_lr,
                    acq_args=(state, f_best_j),
                )
                best_xs.append(x_s)
                best_vs.append(float(v_s))
            new_x = np.asarray(best_xs[int(np.argmax(best_vs))]).reshape(1, -1)
            if gamma is not None:
                g = gamma
            elif method == "UCB":
                # reference's fixed escalation threshold (`v1/MF_UCB.py:23`)
                g = [0.01] * fidelity_num
            else:
                g = [1.0 / (it + 1)] * fidelity_num
            # MF-GP-UCB ladder over the functional posteriors.  The gate
            # compares beta*var against a FIXED gamma (`v1/MF_UCB.py:44`),
            # which is only meaningful in the surrogate's NORMALIZED-y
            # space (the reference's posterior_function operates there);
            # exported posteriors return RAW-space variance, so undo the
            # y_std^2 scaling the export applied — gating on raw variance
            # never escalates on targets with O(10) output scales (the
            # round-4 regression: ours-UCB 9.87 vs reference 12.27).
            new_s = fidelity_num - 1
            for s, (post, state) in enumerate(posts):
                _, v = post(state, jnp.asarray(new_x, jnp.float32))
                y_std = float(state["y_norm"][1])
                v_norm = float(jnp.max(v)) / (y_std * y_std + 1e-12)
                if beta * v_norm > g[s]:
                    new_s = s
                    break
        else:
            def mean_fn(x, s, model=model, dm=dm):
                m, _ = model.forward(dm, x, to_fidelity=s)
                return m.reshape(-1)

            def var_fn(x, s, model=model, dm=dm):
                _, c = model.forward(dm, x, to_fidelity=s)
                c = jnp.asarray(c)
                return (jnp.diagonal(c) if c.ndim == 2 else c).reshape(-1)

            acq = DiscreteMFAcquisition(
                mean_fn, var_fn, fidelity_num, objective.x_dim, f_best=f_best
            )
            score = {
                "UCB": acq.UCB_MF,
                "EI": acq.EI_MF,
                "PI": acq.PI_MF,
                "KG": acq.KG_MF,
            }[method]

            new_x, _, _ = optimize_acq_mf(
                score,
                fidelity_num,
                bounds,
                jax.random.fold_in(key, it),
                n_iterations=acq_iterations,
                learning_rate=acq_lr,
            )
            new_x = np.asarray(new_x).reshape(1, -1)
            g = gamma if gamma is not None else [1.0 / (it + 1)] * fidelity_num
            new_s = acq.acq_selection_fidelity(g, jnp.asarray(new_x, jnp.float32))

        new_y = objective.get_data(new_x, new_s + 1)
        xs[new_s] = np.concatenate([xs[new_s], new_x], axis=0)
        ys[new_s] = np.concatenate([ys[new_s], new_y.reshape(1, -1)], axis=0)

        record["X"].append(new_x.ravel().tolist())
        record["S"].append(int(new_s))
        record["cost"].append(objective.cost.compute_model_cost(ys))
        record["incumbents"].append(float(np.max(ys[-1])))
        record["operation_time"].append(time.time() - t0)
        if checkpoint_path:
            save_bo_state(checkpoint_path, record, xs, ys)
        if verbose:
            print(
                f"iter {it}: x={new_x.ravel()}, s={new_s}, "
                f"incumbent={record['incumbents'][-1]:.4f}, "
                f"cost={record['cost'][-1]:.0f}"
            )
    return record
