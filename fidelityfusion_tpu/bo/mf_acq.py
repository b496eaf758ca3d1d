"""Discrete multi-fidelity acquisitions + fidelity selection.

TPU-native re-design of
`MF_BayesianOptimization/Discrete/DMF_acq.py:16-262`
(`DiscreteAcquisitionFunction` / `optimize_acq_mf`): acquisitions are pure
functions of per-fidelity posterior closures ``mean_fn(x, s)`` /
``var_fn(x, s)`` (s a python int — the per-fidelity graphs differ, so s
stays static); the x-optimization per fidelity is vmapped multi-start Adam
(the reference optimizes ONE random start per fidelity with torch,
`DMF_acq.py:244-262`).

Conventions kept from the reference:
  * ``beta = 0.2 * x_dimension`` (`DMF_acq.py:61`)
  * UCB_MF uses the *variance* (not std) in the bonus (`DMF_acq.py:63`)
  * EI_MF / KG_MF as their single-fidelity counterparts at fidelity s
  * PI_MF returns the log-density score of the improvement z-value
    (`DMF_acq.py:131`)

Fidelity selection (`acq_selection_fidelity`, `DMF_acq.py:168-189`)
implements the MF-GP-UCB rule: query the LOWEST fidelity whose posterior
variance is still informative (beta * var > gamma_s escalates); the
reference's loop overwrites its decision so only the top fidelity's test
survives — a bug not replicated (the v1 implementation
`Discrete/v1/MF_UCB.py:26-48` has the intended ladder semantics).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Callable, List, Sequence, Tuple

import jax
import jax.numpy as jnp

from fidelityfusion_tpu.bo import acq as sf_acq
from fidelityfusion_tpu.bo.optimize import optimize_acqf


@dataclasses.dataclass(frozen=True)
class MFAcqScore:
    """Hashable acquisition score over a functional posterior.

    ``posterior`` is a hashable callable ``(state, x) -> (mean, var)``
    (e.g. `models/ar.py:ARPosterior`); this object is a valid static jit
    argument, so `optimize_acqf(score, ..., acq_args=(state, f_best))`
    caches ONE compiled ascent per (posterior spec, method) and reuses it
    every BO iteration — data and incumbent flow through ``acq_args``.

    Methods follow `DiscreteAcquisitionFunction` (`DMF_acq.py:49-166`):
    UCB uses beta * variance, PI the log-density score, KG fantasy
    sampling with a fixed key (the reference's default).
    """

    posterior: Any
    method: str = "UCB"
    beta: float = 0.2
    num_fantasies: int = 10
    # normalized-y space for UCB scoring: exported posteriors return RAW-y
    # mean/var, but the reference maximizes UCB in its surrogate's
    # NORMALIZED space (`v1/MF_UCB.py:26-38`) — var scales by y_std^2 while
    # mean scales by y_std, so the raw-space argmax can diverge on
    # large-output-scale objectives.  Same space as the fidelity gate
    # (`bo/loop.py`), keeping argmax and gate consistent.
    y_shift: float = 0.0
    y_scale: float = 1.0

    def __call__(self, x, state, f_best):
        mean, var = self.posterior(state, x)
        mean = mean.reshape(-1)
        var = var.reshape(-1)
        if self.method == "UCB":
            mean_n = (mean - self.y_shift) / self.y_scale
            var_n = var / (self.y_scale * self.y_scale)
            return mean_n + self.beta * var_n
        if self.method == "EI":
            return sf_acq.ei(mean, var, f_best)
        if self.method == "PI":
            std = jnp.maximum(jnp.sqrt(jnp.maximum(var, 1e-18)), 1e-9)
            z = (mean - f_best - 0.01) / std
            return -0.5 * z**2 - 0.5 * math.log(2.0 * math.pi)
        if self.method == "KG":
            return sf_acq.kg(
                mean, var, f_best, jax.random.PRNGKey(0), self.num_fantasies
            )
        raise ValueError(f"unknown method {self.method!r}")


class DiscreteMFAcquisition:
    """Bundle of per-fidelity posterior closures + acquisition scores.

    ``mean_fn(x, s)`` / ``var_fn(x, s)``: x is (n, d), s a python int
    fidelity index; return (n,) arrays.
    """

    def __init__(
        self,
        mean_fn: Callable,
        var_fn: Callable,
        fidelity_num: int,
        x_dimension: int,
        f_best=None,
    ):
        self.mean_fn = mean_fn
        self.var_fn = var_fn
        self.fidelity_num = fidelity_num
        self.x_dimension = x_dimension
        self.f_best = f_best
        self.beta = 0.2 * x_dimension

    def UCB_MF(self, x, s: int):
        return self.mean_fn(x, s) + self.beta * self.var_fn(x, s)

    def EI_MF(self, x, s: int, xi: float = 0.01):
        return sf_acq.ei(self.mean_fn(x, s), self.var_fn(x, s), self.f_best, xi)

    def PI_MF(self, x, s: int, theta: float = 0.01):
        mean = self.mean_fn(x, s)
        var = self.var_fn(x, s)
        std = jnp.maximum(jnp.sqrt(jnp.maximum(var, 1e-18)), 1e-9)
        z = (mean - self.f_best - theta) / std
        # reference scores the log normal density of z (`DMF_acq.py:131`)
        return -0.5 * z**2 - 0.5 * math.log(2.0 * math.pi)

    def KG_MF(self, x, s: int, key=None, num_fantasies: int = 10):
        if key is None:
            key = jax.random.PRNGKey(0)
        return sf_acq.kg(
            self.mean_fn(x, s), self.var_fn(x, s), self.f_best, key, num_fantasies
        )

    def acq_selection_fidelity(self, gamma: Sequence[float], new_x) -> int:
        """MF-GP-UCB fidelity ladder (`v1/MF_UCB.py:40-48`): query the
        LOWEST fidelity whose posterior is still uncertain
        (beta * var > gamma_s — a cheap query is informative there);
        when every fidelity is confident, query the top one."""
        for s in range(self.fidelity_num):
            v = float(jnp.max(self.var_fn(new_x, s)))
            if self.beta * v > gamma[s]:
                return s
        return self.fidelity_num - 1


def optimize_acq_mf(
    acq_score: Callable[[jnp.ndarray, int], jnp.ndarray],
    fidelity_num: int,
    bounds: jnp.ndarray,
    key: jax.Array,
    n_iterations: int = 30,
    learning_rate: float = 0.1,
    raw_samples: int = 16,
) -> Tuple[jnp.ndarray, int, jnp.ndarray]:
    """Optimize x per fidelity and return the (x, fidelity) with the best
    acquisition score (`DMF_acq.py:226-262`), with vmapped multi-start Adam
    per fidelity instead of one random torch start.

    Returns (best_x (d,), best_fidelity, best_score).
    """
    best_x: List[jnp.ndarray] = []
    best_v: List[jnp.ndarray] = []
    for s in range(fidelity_num):
        k = jax.random.fold_in(key, s)
        x_s, v_s = optimize_acqf(
            lambda x, s=s: acq_score(x, s),
            bounds,
            k,
            raw_samples=raw_samples,
            steps=n_iterations,
            lr=learning_rate,
        )
        best_x.append(x_s)
        best_v.append(v_s)
    scores = jnp.stack(best_v)
    s_star = int(jnp.argmax(scores))
    return best_x[s_star], s_star, scores[s_star]
