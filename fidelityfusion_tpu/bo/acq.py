"""Single-fidelity acquisition functions as pure JAX functions.

TPU-native re-design of `Bayesian_optimization/acq.py:118-290`: each
acquisition is a pure function of posterior mean/variance arrays, so it
vmaps over candidate batches and jits into the optimizer scan (the
reference detours through scipy's `norm.cdf` on detached numpy,
`acq.py:180-181`, which breaks autodiff — here everything differentiates).

All acquisitions are written to be MAXIMIZED, matching the reference's
max-convention (`UCB.forward`, `acq.py:132-144`).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from jax.scipy.stats import norm


def ucb(mean: jnp.ndarray, var: jnp.ndarray, kappa: float = 2.0) -> jnp.ndarray:
    """Upper confidence bound: mean + kappa * std (`acq.py:118-144`)."""
    return mean + kappa * jnp.sqrt(jnp.maximum(var, 0.0))


def ei(
    mean: jnp.ndarray, var: jnp.ndarray, f_best: jnp.ndarray, xi: float = 0.01
) -> jnp.ndarray:
    """Expected improvement over f_best (max convention) (`acq.py:147-182`)."""
    std = jnp.sqrt(jnp.maximum(var, 1e-18))
    std = jnp.maximum(std, 1e-9)
    z = (mean - f_best - xi) / std
    return (mean - f_best - xi) * norm.cdf(z) + std * norm.pdf(z)


def pi(
    mean: jnp.ndarray, var: jnp.ndarray, f_best: jnp.ndarray, theta: float = 0.01
) -> jnp.ndarray:
    """Probability of improvement (`acq.py:185-219`)."""
    std = jnp.maximum(jnp.sqrt(jnp.maximum(var, 1e-18)), 1e-9)
    z = (mean - f_best - theta) / std
    return norm.cdf(z)


def kg(
    mean: jnp.ndarray,
    var: jnp.ndarray,
    f_best: jnp.ndarray,
    key: jax.Array,
    num_fantasies: int = 10,
) -> jnp.ndarray:
    """Fantasy-sample knowledge gradient (`acq.py:222-256`): draw
    ``num_fantasies`` posterior samples, improvement of the per-point best
    over f_best, averaged.  Explicit PRNG key instead of global RNG."""
    std = jnp.maximum(jnp.sqrt(jnp.maximum(var, 1e-18)), 1e-6)
    eps = jax.random.normal(key, (num_fantasies,) + mean.shape, mean.dtype)
    fantasies = mean + std * eps
    best = jnp.max(fantasies, axis=0)
    return jnp.mean(best - f_best, axis=-1) if best.ndim > 1 else best - f_best


def pf(
    mean: jnp.ndarray, var: jnp.ndarray, thresholds: Sequence[float]
) -> jnp.ndarray:
    """Probability of feasibility under per-output constraints
    (`acq.py:259-290`): product over columns of P(y_i <= threshold_i)."""
    std = jnp.maximum(jnp.sqrt(jnp.maximum(var, 1e-18)), 1e-9)
    th = jnp.asarray(thresholds)
    probs = norm.cdf((th[None, :] - mean) / std)
    return jnp.prod(probs, axis=-1)


def mean_sigma_ratio(mean: jnp.ndarray, var: jnp.ndarray) -> jnp.ndarray:
    """mean / std — one of the MACE ensemble objectives
    (`Bayesian_optimization/con_mace_acq_demo.py:60-133`)."""
    return mean / jnp.maximum(jnp.sqrt(jnp.maximum(var, 1e-18)), 1e-9)
