"""Per-strategy discrete multi-fidelity BO classes with ``compute_next()``.

TPU-native re-design of `MF_BayesianOptimization/Discrete/v1/
{MF_UCB,MF_EI,MF_ES,CFKG,ES}.py`: each strategy wraps per-fidelity
posterior closures and returns the next ``(x, fidelity)`` query.

* `MFUCBStrategy` — MF-GP-UCB (`v1/MF_UCB.py:11-57`): random-candidate
  argmax of per-fidelity UCB with beta = 0.2 d log(t + 1.1); fidelity
  ladder: escalate while beta*var > gamma.
* `MFEIStrategy` — EI at the top fidelity optimized by (vmapped) Adam;
  fidelity by the per-cost variance-reduction rule
  ``cost_i / (sigma^2_before - sigma^2_after)`` with a caller-supplied
  one-step retrain closure (`v1/MF_EI.py:55-97`).
* `MFESStrategy` — entropy search (`v1/MF_ES.py:8-98`, `v1/ES.py:25-178`).
  The reference approximates p_min with emukit's EPMGP; here p_min is
  estimated by MC Thompson sampling over a candidate grid (diagonal
  posterior), and the acquisition is the expected reduction in the p_min
  entropy from fantasized observations — a self-contained replacement for
  the emukit dependency.
* `CFKGStrategy` — per-cost one-step-lookahead knowledge gradient
  (`v1/CFKG.py:12-150`) via the fantasy-update scorer in `bo/cfkg.py`.
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fidelityfusion_tpu.bo import acq as sf_acq
from fidelityfusion_tpu.bo.cfkg import cfkg_select
from fidelityfusion_tpu.bo.optimize import optimize_acqf


class MFUCBStrategy:
    def __init__(
        self,
        x_dimension: int,
        fidelity_num: int,
        posterior_fn: Callable,  # (x, s) -> (mean (n,), var (n,))
        iteration: int = 0,
        gamma: float = 0.01,
        seed: int = 0,
        n_candidates: int = 100,
        bounds: Optional[np.ndarray] = None,
    ):
        self.x_dimension = x_dimension
        self.fidelity_num = fidelity_num
        self.posterior_fn = posterior_fn
        self.beta = 0.2 * x_dimension * math.log(iteration + 1.1)
        self.gamma = gamma
        self.seed = seed
        self.n_candidates = n_candidates
        self.bounds = (
            np.asarray(bounds, float)
            if bounds is not None
            else np.tile([0.0, 1.0], (x_dimension, 1))
        )

    def compute_next(self) -> Tuple[np.ndarray, int]:
        key = jax.random.PRNGKey(self.seed + 1007)
        lo, hi = self.bounds[:, 0], self.bounds[:, 1]
        xs = jax.random.uniform(key, (self.n_candidates, self.x_dimension))
        xs = jnp.asarray(xs * (hi - lo) + lo, jnp.float32)
        scores = []
        for s in range(self.fidelity_num):
            mean, var = self.posterior_fn(xs, s)
            scores.append(mean.reshape(-1) + self.beta * var.reshape(-1))
        stacked = jnp.stack(scores)  # (F, N)
        flat = int(jnp.argmax(stacked))
        new_x = np.asarray(xs[flat % self.n_candidates]).reshape(1, -1)
        # fidelity ladder: lowest s whose uncertainty is already small
        for s in range(self.fidelity_num):
            _, v = self.posterior_fn(jnp.asarray(new_x, jnp.float32), s)
            if self.beta * float(jnp.max(v)) > self.gamma:
                return new_x, s
        return new_x, self.fidelity_num - 1


class MFEIStrategy:
    def __init__(
        self,
        x_dimension: int,
        fidelity_num: int,
        posterior_fn: Callable,
        cost_fn: Callable[[int], float],
        retrain_variance_fn: Optional[Callable] = None,
        f_best: float = 0.0,
        seed: int = 0,
        bounds: Optional[np.ndarray] = None,
    ):
        """``retrain_variance_fn(x, s) -> sigma2_after`` returns the
        top-fidelity posterior variance at x after fantasizing an
        observation at (x, s) (the reference retrains a full surrogate,
        `v1/MF_EI.py:55-97`).  If None, fidelity selection falls back to
        the cheapest fidelity whose variance is non-trivial."""
        self.x_dimension = x_dimension
        self.fidelity_num = fidelity_num
        self.posterior_fn = posterior_fn
        self.cost_fn = cost_fn
        self.retrain_variance_fn = retrain_variance_fn
        self.f_best = f_best
        self.seed = seed
        self.bounds = (
            np.asarray(bounds, float)
            if bounds is not None
            else np.tile([0.0, 1.0], (x_dimension, 1))
        )

    def compute_next(self) -> Tuple[np.ndarray, int]:
        top = self.fidelity_num - 1

        def ei_top(x):
            mean, var = self.posterior_fn(x, top)
            return sf_acq.ei(mean.reshape(-1), var.reshape(-1), self.f_best)

        x_star, _ = optimize_acqf(
            ei_top,
            jnp.asarray(self.bounds, jnp.float32),
            jax.random.PRNGKey(self.seed + 10086),
            raw_samples=16,
            steps=60,
            lr=0.1,
        )
        new_x = np.asarray(x_star).reshape(1, -1)
        xj = jnp.asarray(new_x, jnp.float32)
        _, var_before = self.posterior_fn(xj, top)
        s2_before = float(jnp.max(var_before))
        if self.retrain_variance_fn is None:
            return new_x, 0
        best_mark, new_s = float("inf"), top
        for s in range(self.fidelity_num):
            s2_after = float(self.retrain_variance_fn(new_x, s))
            gain = max(s2_before - s2_after, 1e-12)
            mark = self.cost_fn(s + 1) / gain
            if mark < best_mark:
                best_mark, new_s = mark, s
        return new_x, new_s


class MFESStrategy:
    def __init__(
        self,
        x_dimension: int,
        fidelity_num: int,
        posterior_fn: Callable,
        cost_fn: Callable[[int], float],
        seed: int = 0,
        n_candidates: int = 64,
        n_mc: int = 64,
        gamma: float = 0.01,
        bounds: Optional[np.ndarray] = None,
    ):
        self.x_dimension = x_dimension
        self.fidelity_num = fidelity_num
        self.posterior_fn = posterior_fn
        self.cost_fn = cost_fn
        self.seed = seed
        self.n_candidates = n_candidates
        self.n_mc = n_mc
        self.gamma = gamma
        self.bounds = (
            np.asarray(bounds, float)
            if bounds is not None
            else np.tile([0.0, 1.0], (x_dimension, 1))
        )

    @staticmethod
    def _pmin_entropy(mean, std, key, n_mc):
        """MC estimate of the entropy of p(argmin) over the grid."""
        eps = jax.random.normal(key, (n_mc,) + mean.shape)
        samples = mean[None, :] + std[None, :] * eps
        mins = jnp.argmin(samples, axis=1)
        counts = jnp.bincount(mins, length=mean.shape[0]) + 1e-3
        p = counts / jnp.sum(counts)
        return -jnp.sum(p * jnp.log(p))

    def compute_next(self) -> Tuple[np.ndarray, int]:
        key = jax.random.PRNGKey(self.seed + 31)
        k1, k2, k3 = jax.random.split(key, 3)
        lo, hi = self.bounds[:, 0], self.bounds[:, 1]
        xs = jax.random.uniform(k1, (self.n_candidates, self.x_dimension))
        xs = jnp.asarray(xs * (hi - lo) + lo, jnp.float32)
        top = self.fidelity_num - 1
        mean, var = self.posterior_fn(xs, top)
        mean = mean.reshape(-1)
        std = jnp.sqrt(jnp.maximum(var.reshape(-1), 1e-12))
        h0 = self._pmin_entropy(mean, std, k2, self.n_mc)

        # expected entropy after observing candidate j ~= entropy with the
        # candidate's std collapsed (cheap one-step surrogate of EPMGP's
        # innovation path, `v1/ES.py:155-177`)
        def h_after(j):
            std_new = std.at[j].set(std[j] * 0.1)
            return self._pmin_entropy(mean, std_new, k3, self.n_mc)

        gains = jnp.asarray([h0 - h_after(j) for j in range(self.n_candidates)])
        j_star = int(jnp.argmax(gains))
        new_x = np.asarray(xs[j_star]).reshape(1, -1)
        # information-gap fidelity rule (`v1/MF_ES.py:38-93`): use the
        # cheapest fidelity whose variance at new_x is still informative
        for s in range(self.fidelity_num):
            _, v = self.posterior_fn(jnp.asarray(new_x, jnp.float32), s)
            if float(jnp.max(v)) > self.gamma:
                return new_x, s
        return new_x, top


class CFKGStrategy:
    def __init__(
        self,
        x_dimension: int,
        fidelity_num: int,
        mean_fn: Callable,
        var_fn: Callable,
        cov_fn: Callable,
        cost_fn: Callable[[int], float],
        seed: int = 0,
        n_candidates: int = 40,
        bounds: Optional[np.ndarray] = None,
    ):
        self.args = (mean_fn, var_fn, cov_fn)
        self.fidelity_num = fidelity_num
        self.cost_fn = cost_fn
        self.seed = seed
        self.n_candidates = n_candidates
        self.bounds = (
            np.asarray(bounds, float)
            if bounds is not None
            else np.tile([0.0, 1.0], (x_dimension, 1))
        )

    def compute_next(self) -> Tuple[np.ndarray, int]:
        mean_fn, var_fn, cov_fn = self.args
        return cfkg_select(
            mean_fn,
            var_fn,
            cov_fn,
            self.bounds,
            self.fidelity_num,
            self.cost_fn,
            jax.random.PRNGKey(self.seed + 77),
            n_candidates=self.n_candidates,
        )
