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
  The reference approximates p_min with emukit's EPMGP; here p(argmax) is
  estimated by MC Thompson sampling over a candidate grid (diagonal
  posterior), and the acquisition is the expected reduction in its entropy
  from fantasized observations — a self-contained replacement for the
  emukit dependency.  Fidelity selection is the information-gap rule the
  reference family derives from BOCA (`Continuous/MF_UCB_optimise.py:42-58`
  and `v1/MF_ES.py:49-87`): query the cheapest fidelity whose posterior
  std at the chosen x still exceeds gamma(s) = sqrt(k0) * xi(s) *
  (cost(s)/cost(top))^q with xi(s) = sqrt(1 - corr(f_s, f_top)^2); once
  every cheap fidelity is resolved below its gamma, query the top.  (The
  reference's shipped discrete rule degenerates to "always top":
  `v1/MF_ES.py:84-87` maps any z >= 0.02 to fidelity 2.)
* `CFKGStrategy` — per-cost knowledge gradient on the best-observed
  objective (`v1/CFKG.py:12-150`; fidelity hardcoded to top there) via the
  cross-fidelity fantasy scorer in `bo/cfkg.py`.
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
        cross_scale_fn: Optional[Callable[[int], float]] = None,
        seed: int = 0,
        n_candidates: int = 64,
        n_mc: int = 64,
        is_last: bool = False,
        bounds: Optional[np.ndarray] = None,
    ):
        """``cross_scale_fn(s) -> c`` with cov(f_top(x), f_s(x)) =
        c * var_s(x) (rho-chain product for residual cascades); used by
        the information-gap xi(s).  Defaults to 1 (perfectly coupled)."""
        self.x_dimension = x_dimension
        self.fidelity_num = fidelity_num
        self.posterior_fn = posterior_fn
        self.cost_fn = cost_fn
        self.cross_scale_fn = cross_scale_fn or (lambda s: 1.0)
        self.seed = seed
        self.n_candidates = n_candidates
        self.n_mc = n_mc
        self.is_last = is_last
        self.bounds = (
            np.asarray(bounds, float)
            if bounds is not None
            else np.tile([0.0, 1.0], (x_dimension, 1))
        )

    @staticmethod
    def _pmax_entropy(mean, std, key, n_mc):
        """MC estimate of the entropy of p(argmax) over the grid (the
        protocol maximizes; the reference's EPMGP tracks the minimizer of
        the negated objective — same quantity)."""
        eps = jax.random.normal(key, (n_mc,) + mean.shape)
        samples = mean[None, :] + std[None, :] * eps
        maxs = jnp.argmax(samples, axis=1)
        counts = jnp.bincount(maxs, length=mean.shape[0]) + 1e-3
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

        if self.is_last:
            # final budget iteration: information has no remaining value
            # under the best-observed metric — cash in at the posterior
            # argmax, top fidelity.
            j_star = int(jnp.argmax(mean))
            return np.asarray(xs[j_star]).reshape(1, -1), top

        h0 = self._pmax_entropy(mean, std, k2, self.n_mc)

        # expected entropy after observing candidate j ~= entropy with the
        # candidate's std collapsed (cheap one-step surrogate of EPMGP's
        # innovation path, `v1/ES.py:155-177`)
        def h_after(j):
            std_new = std.at[j].set(std[j] * 0.1)
            return self._pmax_entropy(mean, std_new, k3, self.n_mc)

        gains = jax.vmap(h_after)(jnp.arange(self.n_candidates))
        j_star = int(jnp.argmin(gains))  # min residual entropy = max gain
        new_x = np.asarray(xs[j_star]).reshape(1, -1)
        new_s = self._information_gap_fidelity(new_x, float(jnp.max(std)))
        return new_x, new_s

    def _information_gap_fidelity(self, new_x, std_scale) -> int:
        """BOCA-family fidelity rule (`Continuous/MF_UCB_optimise.py:42-58`,
        `v1/MF_ES.py:49-87`): gamma(s) = sqrt(k0) * xi(s) *
        (cost(s)/cost(top))^q, xi(s) = sqrt(1 - corr(f_s, f_top)^2),
        q = 1/(p + d + 2) with p = 1.  Query the cheapest fidelity whose
        posterior std at new_x exceeds gamma(s); if every cheaper fidelity
        is resolved, query the top."""
        top = self.fidelity_num - 1
        xj = jnp.asarray(new_x, jnp.float32)
        q = 1.0 / (1 + self.x_dimension + 2)
        k0 = max(std_scale, 1e-6) ** 2
        _, v_top = self.posterior_fn(xj, top)
        v_top = float(jnp.max(v_top))
        cost_top = float(self.cost_fn(top + 1))
        for s in range(top):
            _, v_s = self.posterior_fn(xj, s)
            v_s = float(jnp.max(v_s))
            c = float(self.cross_scale_fn(s))
            denom = math.sqrt(max(v_s * v_top, 1e-18))
            corr = min(abs(c) * v_s / denom, 1.0) if denom > 0 else 0.0
            xi = math.sqrt(max(1.0 - corr**2, 0.0))
            gamma_s = (
                math.sqrt(k0)
                * xi
                * (float(self.cost_fn(s + 1)) / cost_top) ** q
            )
            if math.sqrt(max(v_s, 0.0)) > gamma_s:
                return s
        return top


class CFKGStrategy:
    def __init__(
        self,
        x_dimension: int,
        fidelity_num: int,
        mean_fn: Callable,
        cov_full_fn: Callable,
        cost_fn: Callable[[int], float],
        incumbent: float,
        cross_scale_fn: Optional[Callable[[int], float]] = None,
        seed: int = 0,
        n_candidates: int = 64,
        is_last: bool = False,
        bounds: Optional[np.ndarray] = None,
    ):
        """``mean_fn(x, s) -> (n,)``; ``cov_full_fn(x, s) -> (n, n)``
        posterior covariance at fidelity s; ``cross_scale_fn(s) -> c`` with
        cov(f_top(x'), f_s(x)) = c * cov_s(x', x) (rho-chain product for
        residual cascades, 1 for ResGP); ``incumbent`` = max observed
        top-fidelity y; ``is_last`` marks the final budget iteration (no
        future query to cash information in — see bo/cfkg.py)."""
        self.mean_fn = mean_fn
        self.cov_full_fn = cov_full_fn
        self.cross_scale_fn = cross_scale_fn or (lambda s: 1.0)
        self.fidelity_num = fidelity_num
        self.cost_fn = cost_fn
        self.incumbent = incumbent
        self.seed = seed
        self.n_candidates = n_candidates
        self.is_last = is_last
        self.bounds = (
            np.asarray(bounds, float)
            if bounds is not None
            else np.tile([0.0, 1.0], (x_dimension, 1))
        )

    def compute_next(self) -> Tuple[np.ndarray, int]:
        return cfkg_select(
            self.mean_fn,
            self.cov_full_fn,
            self.cross_scale_fn,
            self.bounds,
            self.fidelity_num,
            self.cost_fn,
            self.incumbent,
            jax.random.PRNGKey(self.seed + 77),
            n_candidates=self.n_candidates,
            is_last=self.is_last,
        )
