"""Continuous-fidelity BO outer loop.

TPU-native re-design of
`Experiments/MFBO_continuous/MF_BO_continuous.py:20-100`: FIDES surrogate
over (x, z in [z_min, 1]), continuous-fidelity UCB with the information
gap rule for choosing z, querying the objective at (x, z), recording cost
vs incumbent.  (The reference file imports stale module paths,
`MF_BO_continuous.py:8-14` — treated as layout drift; this is the working
behavior, SURVEY.md §2.6.)
"""

from __future__ import annotations

import time
from typing import Dict

import jax.numpy as jnp
import numpy as np

from fidelityfusion_tpu.bo.continuous import ContinuousFidelityUCB
from fidelityfusion_tpu.data.cost import ContinuousCost
from fidelityfusion_tpu.models.fides import FIDES, FidelityBounds
from fidelityfusion_tpu.train.fit import fit


def mf_bo_continuous(
    objective,
    method: str = "UCB",
    bo_iterations: int = 10,
    n_init: int = 8,
    seed: int = 0,
    train_iters: int = 150,
    train_lr: float = 5e-2,
    z_min: float = 0.1,
    verbose: bool = False,
    init_data=None,
    cost=None,
) -> Dict:
    """``objective`` follows the continuous protocol
    (`data/objectives.py:Branin/Hartmann3`): get_data(x, z) with z a
    continuous fidelity column; initiate_data(num, seed) -> (x, y, z).

    ``method``: "UCB" (information-gap z rule), "ES" (cost-aware entropy
    search over the joint grid), or "KG" (best-observed knowledge
    gradient, `bo/continuous.py:continuous_best_observed_kg`).
    ``init_data`` — optional (x, y, z) initial arrays (head-to-head
    scripts inject the reference's exact draw).  ``cost`` — optional cost
    model; defaults to `ContinuousCost(rate=2.0)`.
    """
    if init_data is not None:
        x, y, z = (np.asarray(a, np.float64).reshape(
            len(init_data[0]), -1) for a in init_data)
    else:
        x, y, z = objective.initiate_data(n_init, seed)
    cost = cost or ContinuousCost(rate=2.0, s_min=z_min, s_max=1.0)
    d = objective.x_dim
    record = {"cost": [], "incumbents": [], "operation_time": [], "X": [], "Z": []}

    for it in range(bo_iterations):
        t0 = time.time()
        # surrogate over the joint (x, z) input via FIDES with full-interval
        # bounds; x normalized per dimension to the search box
        xz = np.concatenate([x, z], axis=1).astype(np.float32)
        ym, ys = y.mean(), y.std() + 1e-9
        yn = ((y - ym) / ys).astype(np.float32)
        fides = FIDES()
        params = fides.init_params(xz.shape[1])
        bounds_f = FidelityBounds(z_min, 1.0, z_min, 1.0)
        xj = jnp.asarray(xz)
        yj = jnp.asarray(yn)
        res = fit(
            lambda p: fides.nll(p, xj, yj, bounds_f),
            params, steps=train_iters, lr=train_lr,
        )

        def posterior_fn(x_in, z_val, res=res, xj=xj, yj=yj):
            x_in = jnp.atleast_2d(jnp.asarray(x_in, jnp.float32))
            xq = jnp.concatenate(
                [x_in, jnp.full((x_in.shape[0], 1), float(z_val), jnp.float32)],
                axis=1,
            )
            mean, var = fides.predict(res.params, xj, yj, xq, bounds_f)
            return mean, var

        srange = list(objective.search_range[:d]) + [[z_min, 1.0]]
        is_last = it == bo_iterations - 1
        if method == "UCB":
            strategy = ContinuousFidelityUCB(
                x_dimension=d, search_range=srange,
                posterior_fn=posterior_fn, cost=cost, seed=seed + it,
            )
            new_x, new_z = strategy.compute_next(steps=30, lr=0.05)
        elif method == "ES":
            from fidelityfusion_tpu.bo.continuous import ContinuousFidelityES

            strategy = ContinuousFidelityES(
                x_dimension=d, search_range=srange,
                posterior_fn=posterior_fn, cost=cost, seed=seed + it,
                maximize=True,
            )
            if is_last:
                # final budget iteration: cash in at the expected-best
                # observed (x, z) — same rationale as bo/cfkg.py
                mu, _ = posterior_fn(jnp.asarray(strategy.xs), 1.0)
                j = int(np.argmax(np.asarray(mu).reshape(-1)))
                new_x, new_z = strategy.xs[j].reshape(1, -1), 1.0
            else:
                new_x, new_z = strategy.compute_next()
        elif method == "KG":
            from fidelityfusion_tpu.bo.continuous import (
                continuous_best_observed_kg,
            )

            def mean_cov_fn(xz, res=res, xj=xj, yj=yj):
                mu_n, cov = fides.predict_full(
                    res.params, xj, yj, jnp.asarray(xz, jnp.float32),
                    bounds_f)
                # de-normalize to raw y units (cov scales by ys^2)
                return mu_n * ys + ym, cov * ys**2

            new_x, new_z = continuous_best_observed_kg(
                mean_cov_fn, srange, cost,
                incumbent=float(np.max(y)), seed=seed + 7 * it,
                is_last=is_last,
            )
        else:
            raise ValueError(method)
        new_y = objective.get_data(new_x, new_z)

        x = np.concatenate([x, new_x], axis=0)
        y = np.concatenate([y, new_y.reshape(1, -1)], axis=0)
        z = np.concatenate([z, np.full((1, 1), new_z)], axis=0)

        record["X"].append(new_x.ravel().tolist())
        record["Z"].append(float(new_z))
        record["cost"].append(float(np.sum(cost.compute_cost(z))))
        record["incumbents"].append(float(np.max(y)))
        record["operation_time"].append(time.time() - t0)
        if verbose:
            print(
                f"iter {it}: z={new_z:.2f} incumbent={record['incumbents'][-1]:.4f}"
            )
    return record
