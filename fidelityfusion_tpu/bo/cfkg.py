"""cfKG: cost-aware discrete-fidelity knowledge gradient (one-step lookahead).

TPU-native re-design of `MF_BayesianOptimization/Discrete/v1/CFKG.py:12-150`.

The reference scores a candidate by retraining a full surrogate on the
fantasized observation and taking the per-cost gain in the max posterior
mean (`CFKG.py:67-78`) — but its fidelity variable is HARDCODED to the top
fidelity (`CFKG.py:119`: ``s = np.ones(N) + 1``), so the shipped strategy
never weighs cost at all: every query is a top-fidelity query.

This module implements the knowledge gradient for the quantity the MFBO
protocol actually records — the **best observed top-fidelity value**
(`Experiments/MFBO_discrete/MF_BO_discrete.py:56-58,148-150`: the incumbent
is ``max(ytr[-1])``; low-fidelity observations can never move it).  The
lookahead is therefore two-step:

1. query (x, s) now, paying cost(s);
2. assume one further top-fidelity query at the updated posterior argmax
   (any sensible policy ends with one — its cost is common to all options
   and drops out of the comparison).

The expected terminal best-observed value under fantasy draw ``e`` is

    V_e = max( incumbent_e , max_x' mu_e^top(x') )

where ``incumbent_e = max(incumbent, y_e)`` if s is the top fidelity
(the draw itself is an observed top value) and ``incumbent`` otherwise,
and ``mu_e^top`` is the top-fidelity posterior mean conditioned on the
fantasy via the exact rank-1 update

    mu_e^top(x') = mu^top(x') + cov(f_top(x'), y(x,s)) / var(y(x,s)) * (y_e - mu(x,s)).

The cross-fidelity covariance ``cov(f_top(x'), f_s(x))`` comes from the
model's coupling structure (for the rho-residual cascade,
``prod_{j>=s} rho_j * cov_s(x', x)``).  On the FINAL budget iteration there
is no future query, so V_e = incumbent_e — which forces the last query to
the top fidelity at the expected-improvement argmax, exactly the cash-in
the protocol's metric demands.

The score is ``(E_e[V_e] - V_now) / cost(s)``.  ``retrain_gain`` keeps the
reference's retrain-per-candidate semantics (append + full posterior
recompute) for approximation-parity tests (tests/test_strategies.py).
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def best_observed_kg_scores(
    mu_top: jnp.ndarray,
    mu_s: jnp.ndarray,
    cov_s: jnp.ndarray,
    cross_scale: float,
    incumbent: float,
    cost_s: float,
    is_top: bool,
    is_last: bool,
    n_draws: int = 24,
    key: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Vectorized best-observed KG score for every grid point as the
    candidate, at one fidelity s.

    mu_top: (n,) top-fidelity posterior mean over the grid.
    mu_s: (n,) fidelity-s posterior mean over the grid.
    cov_s: (n, n) fidelity-s posterior covariance over the grid;
        column i is cov(f_s(grid), f_s(x_i)).
    cross_scale: scalar c with cov(f_top(x'), f_s(x)) = c * cov_s(x', x)
        (rho-chain product for AR/ResGP cascades; 1.0 at the top).
    Returns (n,) per-cost KG scores (candidate i = grid point i).
    """
    n = mu_top.shape[0]
    key = key if key is not None else jax.random.PRNGKey(0)
    eps = jax.random.normal(key, (n_draws,))
    var_c = jnp.maximum(jnp.diagonal(cov_s), 1e-10)  # (n,)
    std_c = jnp.sqrt(var_c)
    # Kalman rows: w[:, i] = cross_scale * cov_s[:, i] / var_c[i]
    w = cross_scale * cov_s / var_c[None, :]
    # fantasy top means: mu_plus[e, :, i] = mu_top + eps_e * std_c[i] * w[:, i]
    # max over the grid axis for each (draw, candidate):
    #   max_x' mu_top(x') + eps_e std_i w[x', i]
    def per_draw(e):
        shifted = mu_top[:, None] + e * std_c[None, :] * w  # (n_grid, n_cand)
        best_mu = jnp.max(shifted, axis=0)  # (n_cand,)
        if is_top:
            y_draw = mu_s + e * std_c  # observed top draw at each candidate
            inc = jnp.maximum(incumbent, y_draw)
        else:
            inc = jnp.full((n,), incumbent)
        if is_last:
            return inc
        return jnp.maximum(inc, best_mu)

    vals = jax.vmap(per_draw)(eps)  # (K, n_cand)
    base = incumbent if is_last else jnp.maximum(incumbent, jnp.max(mu_top))
    return (jnp.mean(vals, axis=0) - base) / cost_s


def cfkg_select(
    mean_fn: Callable,
    cov_full_fn: Callable,
    cross_scale_fn: Callable[[int], float],
    bounds: np.ndarray,
    fidelity_num: int,
    cost_fn: Callable[[int], float],
    incumbent: float,
    key: jax.Array,
    n_candidates: int = 64,
    is_last: bool = False,
    n_draws: int = 24,
) -> Tuple[np.ndarray, int]:
    """Random-candidate cfKG argmax over (x, s) (`CFKG.py:80-140` shape):
    sample a grid of candidates; score every (candidate, fidelity) pair by
    the per-cost best-observed KG; return the best pair.

    mean_fn(x, s) -> (n,) posterior mean; cov_full_fn(x, s) -> (n, n)
    posterior covariance at fidelity s; cross_scale_fn(s) -> scalar c with
    cov(f_top(x'), f_s(x)) = c * cov_s(x', x).
    """
    bounds = np.asarray(bounds, float)
    d = bounds.shape[0]
    kx, ke = jax.random.split(key)
    xs = jax.random.uniform(kx, (n_candidates, d)) * (
        bounds[:, 1] - bounds[:, 0]
    ) + bounds[:, 0]
    xs = jnp.asarray(xs, jnp.float32)

    top = fidelity_num - 1
    mu_top = mean_fn(xs, top).reshape(-1)
    best_score, best_i, best_s = -np.inf, 0, top
    for s in range(fidelity_num):
        mu_s = mu_top if s == top else mean_fn(xs, s).reshape(-1)
        cov_s = cov_full_fn(xs, s)
        scores = best_observed_kg_scores(
            mu_top,
            mu_s,
            cov_s,
            float(cross_scale_fn(s)),
            float(incumbent),
            float(cost_fn(s + 1)),
            is_top=(s == top),
            is_last=is_last,
            n_draws=n_draws,
            key=ke,
        )
        i = int(jnp.argmax(scores))
        v = float(scores[i])
        if v > best_score:
            best_score, best_i, best_s = v, i, s
    return np.asarray(xs[best_i : best_i + 1]), best_s


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


def fantasy_gain(
    mean_fn: Callable,
    var_fn: Callable,
    cov_fn: Callable,
    x_cand: jnp.ndarray,
    s: int,
    x_grid: jnp.ndarray,
    cost_s: float,
) -> jnp.ndarray:
    """Single-fidelity fantasy KG over a grid (per-cost gain in the max
    posterior mean at fidelity s) — the rank-1 analogue of `retrain_gain`,
    kept as the approximation-parity counterpart for tests.

    ``cov_fn(a, b, s) -> (n_a, n_b)`` posterior cross-covariance at
    fidelity s.
    """
    mu_grid = mean_fn(x_grid, s).reshape(-1)
    var_c = var_fn(x_cand, s).reshape(-1)[0]
    cov_row = cov_fn(x_grid, x_cand, s).reshape(-1)
    std_c = jnp.sqrt(jnp.maximum(var_c, 1e-12))
    weights = cov_row / jnp.maximum(var_c, 1e-12)

    key = jax.random.PRNGKey(0)
    eps = jax.random.normal(key, (16,))
    fantasized = mu_grid[None, :] + eps[:, None] * std_c * weights[None, :]
    exp_max = jnp.mean(jnp.max(fantasized, axis=1))
    base_max = jnp.max(mu_grid)
    return (exp_max - base_max) / cost_s
