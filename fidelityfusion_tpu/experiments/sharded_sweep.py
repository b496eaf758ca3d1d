"""Device-sharded experiment sweeps: the seeds axis runs data-parallel.

The reference's sweeps are nested Python loops over seeds x datasets x
models (`Experiments/GAR_Non_Aligned/exp_non_aligned.py:47-54`) — the
embarrassingly parallel axes SURVEY.md §2.8 marks for sharding.  Here the
SEED axis of one (method, dataset, n_high) cell becomes a vmapped batch of
complete training runs (every seed has identical shapes) sharded across
the device mesh: S seeds train simultaneously, one jitted program.

Restricted to the 2-fidelity subset AR protocol (the sweep workhorse);
the general harness (`experiments/sweep.py`) covers everything else
serially.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from fidelityfusion_tpu.experiments.load_mfdata import load_data
from fidelityfusion_tpu.experiments.metrics import calculate_metrix
from fidelityfusion_tpu.models.cigp import CIGP
from fidelityfusion_tpu.ops.kernels import SquaredExponentialKernel
from fidelityfusion_tpu.parallel.mesh import make_mesh, shard_leading_axis
from fidelityfusion_tpu.train.fit import adam_scan


def _ar_train_predict(gp: CIGP, steps: int, lr: float):
    """One complete 2-fidelity AR run (train low GP, train residual GP+rho,
    predict cascade) as a pure function of one seed's data arrays."""
    opt = optax.adam(lr)

    def train_last_good(loss_fn, p0):
        # `good_p` is the last params whose loss was verified finite
        # (the final params are one never-evaluated update ahead).
        _, good_p, losses = adam_scan(loss_fn, p0, opt, steps)
        return good_p, losses

    def run(data):
        xl, yl, xh, yl_at_xh, yh, xt = (
            data["xl"], data["yl"], data["xh"], data["yl_at_xh"],
            data["yh"], data["xt"],
        )
        p0 = data["p_low"]
        p_low, _ = train_last_good(lambda p: gp.nll(p, xl, yl), p0)

        def res_loss(pr):
            res = yh - pr["rho"] * yl_at_xh
            return gp.nll(pr["gp"], xh, res)

        p_res, _ = train_last_good(
            res_loss, {"gp": data["p_res"], "rho": data["rho"]}
        )

        mean_l, var_l = gp.predict_diag(p_low, xl, yl, xt)
        res_final = yh - p_res["rho"] * yl_at_xh
        mean_r, var_r = gp.predict_diag(p_res["gp"], xh, res_final, xt)
        mean = p_res["rho"] * mean_l + mean_r
        var = p_res["rho"] ** 2 * var_l + var_r
        return mean, var

    return run


def run_sharded_seed_sweep(
    dataset: str,
    seeds: Sequence[int],
    n_high: int = 16,
    n_low: int = 64,
    n_test: int = 64,
    steps: int = 200,
    lr: float = 5e-2,
    mesh=None,
) -> List[Dict[str, float]]:
    """Train AR for every seed simultaneously (vmapped + mesh-sharded).

    Returns one metric row per seed (r2/rmse/nll/nrmse), numerically the
    same protocol as `experiments/sweep.py:run_single(method='AR')` with
    normalization folded into the data build.
    """
    # hybrid_nll off: this nll runs under vmap (seeds axis), where the
    # single-matrix hybrid path's batched XLA cholesky serializes
    gp = CIGP(kernel=SquaredExponentialKernel(), hybrid_nll=False)

    batches = []
    truths = []
    denorms = []
    for seed in seeds:
        d = load_data(dataset, n_train_low=n_low, n_train_high=n_high,
                      n_test=n_test, seed=seed, subset=True)
        xl, yl = d["x_low"], d["y_low"]
        xm, xs = xl.mean(0), xl.std(0) + 1e-10
        ym, ys = yl.mean(), yl.std() + 1e-10
        yhm, yhs = d["y_high"].mean(), d["y_high"].std() + 1e-10
        # low-fidelity y at the high-fidelity x (subset -> exact lookup)
        lookup = {tuple(r): i for i, r in enumerate(map(tuple, xl))}
        yl_at_xh = np.stack([yl[lookup[tuple(r)]] for r in map(tuple, d["x_high"])])
        batches.append(
            {
                "xl": ((xl - xm) / xs).astype(np.float32),
                "yl": ((yl - ym) / ys).astype(np.float32),
                "xh": ((d["x_high"] - xm) / xs).astype(np.float32),
                "yl_at_xh": ((yl_at_xh - ym) / ys).astype(np.float32),
                "yh": ((d["y_high"] - yhm) / yhs).astype(np.float32),
                "xt": ((d["x_test"] - xm) / xs).astype(np.float32),
                "p_low": jax.tree_util.tree_map(np.asarray, gp.init_params(d["x_dim"])),
                "p_res": jax.tree_util.tree_map(np.asarray, gp.init_params(d["x_dim"])),
                "rho": np.asarray(1.0, np.float32),
            }
        )
        truths.append(d["y_test"])
        denorms.append((yhm, yhs))

    batch = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *batches)
    if mesh is None:
        mesh = make_mesh(min(len(seeds), len(jax.devices())))
    if len(seeds) % mesh.devices.size == 0:
        batch = shard_leading_axis(batch, mesh)

    run = _ar_train_predict(gp, steps, lr)
    with mesh:
        means, vars_ = jax.jit(jax.vmap(run))(batch)

    rows = []
    for i, seed in enumerate(seeds):
        yhm, yhs = denorms[i]
        mean = np.asarray(means[i]) * yhs + yhm
        var = np.asarray(vars_[i]) * yhs**2
        row = calculate_metrix(truths[i], mean, var)
        row.update({"seed": seed, "dataset": dataset, "n_high": n_high})
        rows.append(row)
    return rows
