"""Tests for per-strategy BO classes, MACE, and the continuous BO loop."""

import numpy as np
import jax
import jax.numpy as jnp

from fidelityfusion_tpu.bo.mace import mace_select, pareto_mask
from fidelityfusion_tpu.bo.strategies import (
    CFKGStrategy,
    MFEIStrategy,
    MFESStrategy,
    MFUCBStrategy,
)
from fidelityfusion_tpu.bo.continuous_loop import mf_bo_continuous
from fidelityfusion_tpu.data.objectives import Branin


def _posterior(x, s):
    mean = jnp.sum(jnp.sin(5 * x), axis=-1)
    var = jnp.ones(x.shape[0]) * (0.5 / (s + 1))
    return mean, var


def test_mf_ucb_strategy():
    s = MFUCBStrategy(1, 2, _posterior, iteration=3, seed=0)
    x, fid = s.compute_next()
    assert x.shape == (1, 1)
    assert fid in (0, 1)
    # huge gamma: every fidelity looks confident -> query top fidelity
    s2 = MFUCBStrategy(1, 2, _posterior, iteration=3, gamma=1e6)
    _, fid2 = s2.compute_next()
    assert fid2 == 1
    # tiny gamma: low fidelity still uncertain -> query it
    s3 = MFUCBStrategy(1, 2, _posterior, iteration=3, gamma=1e-9)
    _, fid3 = s3.compute_next()
    assert fid3 == 0


def test_mf_ei_strategy_with_retrain_rule():
    calls = []

    def retrain_var(x, s):
        calls.append(s)
        return 0.5 / (s + 1) * 0.5  # fidelity 1 reduces more variance

    strat = MFEIStrategy(
        1, 2, _posterior, cost_fn=lambda s: float(s), retrain_variance_fn=retrain_var,
        f_best=0.5,
    )
    x, fid = strat.compute_next()
    assert x.shape == (1, 1)
    assert sorted(set(calls)) == [0, 1]


def test_mf_es_strategy():
    strat = MFESStrategy(1, 2, _posterior, cost_fn=lambda s: float(s), seed=1,
                         n_candidates=24, n_mc=32)
    x, fid = strat.compute_next()
    assert x.shape == (1, 1)
    assert fid in (0, 1)


def test_cfkg_strategy():
    def mean_fn(x, s):
        return jnp.sum(jnp.sin(5 * x), axis=-1)

    def var_fn(x, s):
        return jnp.ones(x.shape[0]) * 0.3

    def cov_fn(a, b, s):
        d2 = jnp.sum((a[:, None, :] - b[None, :, :]) ** 2, -1)
        return 0.3 * jnp.exp(-2.0 * d2)

    strat = CFKGStrategy(1, 2, mean_fn, var_fn, cov_fn, cost_fn=lambda s: float(s),
                         n_candidates=10)
    x, fid = strat.compute_next()
    assert x.shape == (1, 1)
    assert fid in (0, 1)


def test_pareto_mask():
    objs = jnp.asarray([[0.0, 1.0], [1.0, 0.0], [0.5, 0.5], [1.0, 1.0]])
    mask = np.asarray(pareto_mask(objs))
    assert mask.tolist() == [True, True, True, False]


def test_mace_select():
    def posterior(xs):
        return jnp.sum(jnp.sin(3 * xs), -1), jnp.ones(xs.shape[0]) * 0.2

    x = mace_select(posterior, np.array([[0.0, 1.0]]), f_best=0.5,
                    key=jax.random.PRNGKey(0), n_candidates=128)
    assert x.shape == (1, 1)
    assert 0.0 <= x[0, 0] <= 1.0


def test_continuous_es_strategy():
    from fidelityfusion_tpu.bo.continuous import ContinuousFidelityES
    from fidelityfusion_tpu.data.cost import ContinuousCost

    def posterior(x, z):
        mean = jnp.sum(jnp.sin(5 * x), axis=-1)
        var = jnp.ones(x.shape[0]) * 0.4
        return mean, var

    strat = ContinuousFidelityES(
        1, [[0.0, 1.0], [0.1, 1.0]], posterior, ContinuousCost(),
        seed=0, n_candidates=24, n_mc=32,
    )
    x, z = strat.compute_next()
    assert x.shape == (1, 1)
    assert 0.1 <= z <= 1.0


def test_continuous_kg_strategy():
    from fidelityfusion_tpu.bo.continuous import ContinuousFidelityKG
    from fidelityfusion_tpu.data.cost import ContinuousCost

    def posterior(x, z):
        mean = jnp.sum(jnp.sin(5 * x), axis=-1)
        return mean, jnp.ones(x.shape[0]) * 0.3

    calls = []

    def fantasy_max(x, z):
        calls.append(float(z))
        # fantasizing at higher fidelity raises the max more
        return 1.0 + 0.5 * z

    strat = ContinuousFidelityKG(
        1, [[0.0, 1.0], [0.1, 1.0]], posterior, fantasy_max,
        ContinuousCost(), seed=0, n_candidates=8, n_grid=32,
    )
    x, z = strat.compute_next()
    assert x.shape == (1, 1)
    assert 0.1 <= z <= 1.0
    assert len(calls) == 8


def test_continuous_bo_loop():
    rec = mf_bo_continuous(Branin(), bo_iterations=2, n_init=6, seed=0,
                           train_iters=60)
    assert len(rec["incumbents"]) == 2
    assert all(0.1 <= z <= 1.0 for z in rec["Z"])
    inc = rec["incumbents"]
    assert inc[1] >= inc[0] - 1e-9
