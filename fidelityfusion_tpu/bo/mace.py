"""MACE: multi-objective acquisition-ensemble candidate selection.

TPU-native re-design of `Bayesian_optimization/con_mace_acq_demo.py:60-133`:
six acquisition objectives (-UCB, -PI, -EI, -PF, mean, mean/sigma) define
a multi-objective problem; the reference runs platypus NSGA-II and picks a
random Pareto member.  Platypus is not a dependency here — the Pareto
front is extracted by vectorized non-domination filtering over a sampled
candidate set (jnp ops), which at BO-scale candidate counts is both
simpler and faster than an evolutionary loop.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fidelityfusion_tpu.bo import acq as sf_acq


def pareto_mask(objectives: jnp.ndarray) -> jnp.ndarray:
    """Boolean mask of non-dominated rows (minimization, (n, k))."""
    o = objectives[:, None, :]  # (n, 1, k)
    p = objectives[None, :, :]  # (1, n, k)
    dominated_by = jnp.all(p <= o, axis=-1) & jnp.any(p < o, axis=-1)  # (n, n)
    return ~jnp.any(dominated_by, axis=1)


def mace_objectives(
    mean: jnp.ndarray,
    var: jnp.ndarray,
    f_best: float,
    thresholds: Optional[Sequence[float]] = None,
    kappa: float = 2.0,
) -> jnp.ndarray:
    """The six MACE objectives, all to MINIMIZE (n, 6)
    (`con_mace_acq_demo.py:60-102`)."""
    mean = mean.reshape(-1)
    var = var.reshape(-1)
    cols = [
        -sf_acq.ucb(mean, var, kappa),
        -sf_acq.pi(mean, var, f_best),
        -sf_acq.ei(mean, var, f_best),
        -(
            sf_acq.pf(mean[:, None], var[:, None], thresholds)
            if thresholds is not None
            else jnp.zeros_like(mean)
        ),
        mean,
        sf_acq.mean_sigma_ratio(mean, var),
    ]
    return jnp.stack(cols, axis=1)


def mace_select(
    posterior_fn: Callable[[jnp.ndarray], Tuple[jnp.ndarray, jnp.ndarray]],
    bounds: np.ndarray,
    f_best: float,
    key: jax.Array,
    n_candidates: int = 512,
    thresholds: Optional[Sequence[float]] = None,
) -> np.ndarray:
    """Sample candidates, filter the Pareto front of the acquisition
    ensemble, pick a random front member (`con_mace_acq_demo.py:103-124`)."""
    bounds = np.asarray(bounds, float)
    k1, k2 = jax.random.split(key)
    lo, hi = bounds[:, 0], bounds[:, 1]
    xs = jax.random.uniform(k1, (n_candidates, bounds.shape[0]))
    xs = jnp.asarray(xs * (hi - lo) + lo, jnp.float32)
    mean, var = posterior_fn(xs)
    objs = mace_objectives(mean, var, f_best, thresholds)
    mask = pareto_mask(objs)
    front = jnp.where(mask)[0]
    pick = front[jax.random.randint(k2, (), 0, front.shape[0])]
    return np.asarray(xs[pick]).reshape(1, -1)
