"""cfKG: continuous/discrete-fidelity knowledge gradient (one-step lookahead).

TPU-native re-design of `MF_BayesianOptimization/Discrete/v1/CFKG.py:12-150`:
for each candidate (x, s), imagine observing the posterior-mean value
there, update the surrogate, and score the per-cost gain in the maximum
posterior mean at the top fidelity:

    kg(x, s) = (max_x' mu+[x'] - max_x' mu[x']) / cost(s)

The reference re-trains a full surrogate per candidate (`CFKG.py:67-69`),
which is the dominant cost of its BO loop.  Here the lookahead posterior
uses the *fantasy update* of the current GP stage (exact rank-1 posterior
conditioning on the imagined observation) — mathematically the conditional
posterior the retrain approximates, at a tiny fraction of the cost;
`retrain_gain` reproduces the reference's retrain-per-candidate semantics
(append + full posterior recompute) for parity checks, and
tests/test_strategies.py asserts the two scorers agree.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def fantasy_gain(
    mean_fn: Callable,
    var_fn: Callable,
    cov_fn: Callable,
    x_cand: jnp.ndarray,
    s: int,
    x_grid: jnp.ndarray,
    cost_s: float,
) -> jnp.ndarray:
    """KG score of candidate x_cand at fidelity s over a reference grid.

    ``cov_fn(a, b, s) -> (n_a, n_b)`` posterior cross-covariance at
    fidelity s.  The fantasy update conditions the top-fidelity posterior
    mean on observing y(x_cand, s) = mu(x_cand, s):  because the imagined
    value equals the current mean, the updated *mean* is unchanged in
    expectation; KG therefore uses the expected max over the fantasy
    distribution (Gaussian with the posterior covariance row):

        mu+(x') = mu(x') + cov(x', x_c) / (var(x_c)+eps) * eps_draw * std
    """
    mu_grid = mean_fn(x_grid, s).reshape(-1)
    var_c = var_fn(x_cand, s).reshape(-1)[0]
    cov_row = cov_fn(x_grid, x_cand, s).reshape(-1)
    std_c = jnp.sqrt(jnp.maximum(var_c, 1e-12))
    weights = cov_row / jnp.maximum(var_c, 1e-12)

    # expected-max over K fantasy draws of the observation noise
    key = jax.random.PRNGKey(0)
    eps = jax.random.normal(key, (16,))
    fantasized = mu_grid[None, :] + eps[:, None] * std_c * weights[None, :]
    exp_max = jnp.mean(jnp.max(fantasized, axis=1))
    base_max = jnp.max(mu_grid)
    return (exp_max - base_max) / cost_s


def retrain_gain(
    gp,
    params,
    x_train: jnp.ndarray,
    y_train: jnp.ndarray,
    x_cand: jnp.ndarray,
    x_grid: jnp.ndarray,
    cost_s: float,
    n_draws: int = 16,
) -> float:
    """Parity-mode KG: per fantasy draw, APPEND the imagined observation to
    the training set and recompute the FULL GP posterior over the grid —
    the reference's retrain-per-candidate semantics (`v1/CFKG.py:67-78`)
    with exact conditioning in place of the hyperparameter refit (the
    refit's hyperparameter drift from one imagined point is noise, not
    signal; conditioning is the quantity the refit approximates).

    Uses the same PRNG draws as `fantasy_gain`, so the two scorers must
    agree to linear-algebra roundoff — the correctness contract of the
    rank-1 fantasy shortcut (tests/test_strategies.py).
    """
    mu_c, var_c = gp.predict_diag(params, x_train, y_train, x_cand)
    mu_c = mu_c.reshape(-1)[0]
    std_c = jnp.sqrt(jnp.maximum(var_c.reshape(-1)[0], 1e-12))
    base_mu, _ = gp.predict_diag(params, x_train, y_train, x_grid)
    base_max = jnp.max(base_mu)

    eps = jax.random.normal(jax.random.PRNGKey(0), (n_draws,))
    x_aug = jnp.concatenate([x_train, x_cand], axis=0)
    maxes = []
    for k in range(n_draws):
        y_obs = (mu_c + eps[k] * std_c).reshape(1, 1)
        y_aug = jnp.concatenate([y_train.reshape(-1, 1), y_obs], axis=0)
        mu_k, _ = gp.predict_diag(params, x_aug, y_aug, x_grid)
        maxes.append(jnp.max(mu_k))
    exp_max = jnp.mean(jnp.asarray(maxes))
    return float((exp_max - base_max) / cost_s)


def cfkg_select(
    mean_fn: Callable,
    var_fn: Callable,
    cov_fn: Callable,
    bounds: np.ndarray,
    fidelity_num: int,
    cost_fn: Callable[[int], float],
    key: jax.Array,
    n_candidates: int = 50,
) -> Tuple[np.ndarray, int]:
    """Random-candidate cfKG argmax over (x, s) (`CFKG.py:80-140`):
    sample candidates uniformly; for each fidelity score the per-cost
    fantasy gain over the same candidate set; return the best pair."""
    bounds = np.asarray(bounds, float)
    d = bounds.shape[0]
    xs = jax.random.uniform(key, (n_candidates, d)) * (
        bounds[:, 1] - bounds[:, 0]
    ) + bounds[:, 0]
    xs = jnp.asarray(xs, jnp.float32)

    best = (-np.inf, None, None)
    for s in range(fidelity_num):
        c = float(cost_fn(s + 1))
        for i in range(n_candidates):
            g = float(
                fantasy_gain(
                    mean_fn, var_fn, cov_fn, xs[i : i + 1], s, xs, c
                )
            )
            if g > best[0]:
                best = (g, np.asarray(xs[i : i + 1]), s)
    return best[1], best[2]
