"""Continuous-fidelity acquisition strategies.

TPU-native re-design of `MF_BayesianOptimization/Continuous/
{MF_UCB,MF_UCB_optimise,MF_ES,CFKG}.py`: fidelity z lives in an interval;
the fidelity choice balances the information gap

    xi(z)   = sqrt(1 - phi(z)^2),  phi = SE correlation between z and z=1
    gamma(z) = sqrt(k_0) * xi(z) * (cost(z)/cost(1))^q,  q = 1/(p + d + 2)

(`Continuous/MF_UCB_optimise.py:42-58`): optimize x by (vmapped
multi-start) Adam on the top-fidelity UCB, then pick the SMALLEST z whose
posterior std still exceeds gamma(z) and whose information gap is large
enough (`:100-121`); fall back to z = z_min.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fidelityfusion_tpu.bo.optimize import optimize_acqf


class ContinuousFidelityUCB:
    """MF-GP-UCB with continuous fidelities (`MF_UCB_optimise.py:10-129`).

    ``posterior_fn(x, z) -> (mean, var)`` with x (n, d), z scalar.
    ``cost`` follows `data/cost.py:ContinuousCost`.
    """

    def __init__(
        self,
        x_dimension: int,
        search_range,
        posterior_fn: Callable,
        cost,
        seed: int = 0,
        beta: float = 1.0,
        k_0: float = 1.0,
        p: float = 1.0,
        z_grid_size: int = 100,
        length_scale_z: float = 1.0,
    ):
        self.x_dimension = x_dimension
        self.search_range = search_range
        self.posterior_fn = posterior_fn
        self.cost = cost
        self.beta = beta
        self.k_0 = k_0
        self.p = p
        self.length_scale_z = length_scale_z
        z_lo, z_hi = search_range[-1]
        key = jax.random.PRNGKey(seed)
        self.z_range = np.sort(
            np.asarray(jax.random.uniform(key, (z_grid_size,))) * (z_hi - z_lo)
            + z_lo
        )
        self.seed = seed

    def information_gap(self, z) -> np.ndarray:
        """xi(z) = sqrt(1 - phi(z)^2), phi = SE correlation with z=1
        (`MF_UCB_optimise.py:42-52`)."""
        z = np.asarray(z, float).reshape(-1)
        phi = np.exp(-0.5 * ((z - 1.0) / self.length_scale_z) ** 2)
        return np.sqrt(np.maximum(1.0 - phi**2, 0.0))

    def gamma_z(self, xi_z: np.ndarray) -> np.ndarray:
        """(`MF_UCB_optimise.py:54-58`)."""
        q = 1.0 / (self.p + self.x_dimension + 2.0)
        lam = np.power(
            self.cost.compute_cost(self.z_range) / self.cost.compute_cost(1.0), q
        )
        return np.sqrt(self.k_0) * xi_z * lam.reshape(-1)

    def compute_next(
        self, key: Optional[jax.Array] = None, steps: int = 20, lr: float = 0.01
    ) -> Tuple[np.ndarray, float]:
        """Optimize x on top-fidelity UCB, then scan z thresholds
        (`MF_UCB_optimise.py:76-121`).  Returns (x (1,d), z)."""
        if key is None:
            key = jax.random.PRNGKey(self.seed + 10086)
        z_top = float(self.search_range[-1][-1])
        bounds = jnp.asarray(self.search_range[: self.x_dimension], jnp.float32)

        def acq(x):
            mean, var = self.posterior_fn(x, z_top)
            return (mean + self.beta * var).reshape(-1)

        new_x, _ = optimize_acqf(acq, bounds, key, raw_samples=8, steps=steps, lr=lr)
        new_x = np.asarray(new_x).reshape(1, -1)

        stds = []
        for z in self.z_range:
            _, v = self.posterior_fn(jnp.asarray(new_x, jnp.float32), float(z))
            stds.append(float(np.sqrt(np.maximum(np.asarray(v).ravel()[0], 0.0))))
        xi = self.information_gap(self.z_range)
        gamma = self.gamma_z(xi)
        xi_floor = self.information_gap(np.sqrt(self.p))[0] / np.sqrt(self.beta)

        candidates = [
            z
            for z, s_z, x_z, g_z in zip(self.z_range, stds, xi, gamma)
            if s_z > g_z and x_z > xi_floor
        ]
        new_z = float(min(candidates)) if candidates else float(self.search_range[-1][0])
        return new_x, new_z


def _candidate_grid(key, search_range, x_dimension, n):
    """Random x candidates + sorted z candidates, paired by index
    (`Continuous/MF_ES.py:13-20`, `Continuous/CFKG.py:73-81`)."""
    kx, kz = jax.random.split(key)
    bounds = np.asarray(search_range[:x_dimension], float)
    xs = np.asarray(jax.random.uniform(kx, (n, x_dimension)))
    xs = xs * (bounds[:, 1] - bounds[:, 0]) + bounds[:, 0]
    z_lo, z_hi = search_range[-1]
    zs = np.sort(np.asarray(jax.random.uniform(kz, (n,))) * (z_hi - z_lo) + z_lo)
    return xs.astype(np.float32), zs


class ContinuousFidelityES:
    """MAX-VALUE entropy search over continuous fidelities
    (`Continuous/MF_ES.py:8-88` + `Continuous/ES.py:25-178` redesigned).

    The reference scores candidates by the entropy of the ARGMAX-location
    distribution (emukit-EPMGP p_min).  The recorded continuous protocol
    judges strategies by the best OBSERVED top-fidelity value
    (`Experiments/MFBO_continuous/MF_BO_continuous.py:100`), and argmax-
    location entropy is the wrong currency for that metric — the same
    diagnosis that led to the best-observed cfKG redesign (`bo/cfkg.py`;
    round-3 evidence: location-ES lost to reference cfKG -3.62 vs -3.24).
    This class therefore scores by the entropy of the optimum's VALUE
    distribution (max-value entropy search, the information-theoretic
    dual in the value currency):

        alpha(x) = E_{y*}[ gamma*phi(gamma)/(2*Phi(gamma))
                           - log Phi(gamma) ],
        gamma    = (y* - mu_top(x)) / sigma_top(x),

    with y* sampled by MC from the joint top-fidelity posterior max over
    the candidate grid.  A fidelity-z observation carries phi(z)^2 of the
    top-fidelity information (SE correlation over z), so candidate
    (x_i, z_i) scores phi(z_i)^2 * alpha(x_i) / cost(z_i) — information
    about the optimum's value per unit cost.
    """

    def __init__(
        self,
        x_dimension: int,
        search_range,
        posterior_fn: Callable,
        cost,
        seed: int = 0,
        n_candidates: int = 100,
        n_mc: int = 128,
        length_scale_z: float = 1.0,
        cost_aware: bool = True,
        maximize: bool = False,
    ):
        self.x_dimension = x_dimension
        self.search_range = search_range
        self.posterior_fn = posterior_fn
        self.cost = cost
        self.seed = seed
        self.n_mc = n_mc
        self.length_scale_z = length_scale_z
        self.cost_aware = cost_aware
        self.maximize = maximize
        self.xs, self.zs = _candidate_grid(
            jax.random.PRNGKey(seed), search_range, x_dimension, n_candidates
        )

    def compute_next(self) -> Tuple[np.ndarray, float]:
        from jax.scipy.stats import norm as jnorm

        z_top = float(self.search_range[-1][-1])
        mean, var = self.posterior_fn(jnp.asarray(self.xs), z_top)
        mean = mean.reshape(-1)
        if not self.maximize:  # mirror so the formulas maximize
            mean = -mean
        std = jnp.sqrt(jnp.maximum(var.reshape(-1), 1e-12))

        # MC samples of the top-fidelity optimum VALUE y* over the grid
        key = jax.random.PRNGKey(self.seed + 131)
        eps = jax.random.normal(key, (self.n_mc, mean.shape[0]))
        y_star = jnp.max(mean[None, :] + std[None, :] * eps, axis=1)  # (M,)
        # y* below a candidate's own mean gives no truncation information;
        # clamp gamma for numerical sanity of log Phi
        gamma = (y_star[None, :] - mean[:, None]) / std[:, None]  # (n, M)
        gamma = jnp.clip(gamma, -6.0, 10.0)
        cdf = jnp.maximum(jnorm.cdf(gamma), 1e-10)
        alpha = jnp.mean(
            gamma * jnorm.pdf(gamma) / (2.0 * cdf) - jnp.log(cdf), axis=1
        )

        # information fraction a fidelity-z observation carries about the
        # top-fidelity value (SE correlation over z, `MF_UCB_optimise.py:42`)
        phi = jnp.exp(
            -0.5 * ((jnp.asarray(self.zs) - z_top) / self.length_scale_z) ** 2
        )
        scores = np.asarray(phi**2 * alpha)
        if self.cost_aware:
            scores = scores / np.maximum(self.cost.compute_cost(self.zs), 1e-9)
        j = int(np.argmax(scores))
        return self.xs[j].reshape(1, -1), float(self.zs[j])


def continuous_best_observed_kg(
    mean_cov_fn: Callable,
    search_range,
    cost,
    incumbent: float,
    seed: int = 0,
    n_candidates: int = 48,
    n_grid: int = 64,
    n_draws: int = 24,
    is_last: bool = False,
) -> Tuple[np.ndarray, float]:
    """Continuous-fidelity knowledge gradient on the best-OBSERVED value
    (`Continuous/CFKG.py:11-140` semantics, redesigned like `bo/cfkg.py`).

    The continuous protocol's incumbent is the max over ALL observed y
    regardless of z (`Experiments/MFBO_continuous/MF_BO_continuous.py:100`),
    so a draw at any (x, z) can move it.  Candidate (x_i, z_i) is scored by
    the two-step lookahead

        (E_e[ max(max(inc, y_e), max_grid mu_e^top) ] - V_now) / cost(z_i)

    where mu_e^top is the z=1 posterior mean over an x grid after the
    rank-1 fantasy update through the joint (x, z) posterior covariance.
    On the final budget iteration the future-query term drops and the
    score is E[max(inc, y_e)] — pure expected observed improvement.

    ``mean_cov_fn(xz (m, d+1)) -> (mean (m,), cov (m, m))`` is the joint
    posterior (e.g. `FIDES.predict_full`).
    """
    key = jax.random.PRNGKey(seed + 86)
    kx, kg, ke = jax.random.split(key, 3)
    xs, zs = _candidate_grid(kx, search_range, len(search_range) - 1,
                             n_candidates)
    grid, _ = _candidate_grid(kg, search_range, len(search_range) - 1, n_grid)
    z_top = float(search_range[-1][-1])

    cand_xz = np.concatenate([xs, zs.reshape(-1, 1).astype(np.float32)],
                             axis=1)
    grid_xz = np.concatenate(
        [grid, np.full((n_grid, 1), z_top, np.float32)], axis=1)
    all_xz = jnp.asarray(np.concatenate([grid_xz, cand_xz], axis=0))
    mu, C = mean_cov_fn(all_xz)
    mu = jnp.asarray(mu).reshape(-1)
    mu_grid, mu_cand = mu[:n_grid], mu[n_grid:]
    var_c = jnp.maximum(jnp.diagonal(C)[n_grid:], 1e-10)
    std_c = jnp.sqrt(var_c)
    w = C[:n_grid, n_grid:] / var_c[None, :]  # (n_grid, n_cand) kalman rows

    eps = jax.random.normal(ke, (n_draws,))

    def per_draw(e):
        y_draw = mu_cand + e * std_c
        inc = jnp.maximum(incumbent, y_draw)  # any-z observation counts
        if is_last:
            return inc
        shifted = mu_grid[:, None] + e * std_c[None, :] * w
        return jnp.maximum(inc, jnp.max(shifted, axis=0))

    vals = jnp.mean(jax.vmap(per_draw)(eps), axis=0)
    base = incumbent if is_last else max(incumbent, float(jnp.max(mu_grid)))
    costs = np.maximum(np.asarray(cost.compute_cost(zs)).reshape(-1), 1e-9)
    scores = (np.asarray(vals) - base) / (np.ones_like(costs) if is_last
                                          else costs)
    j = int(np.argmax(scores))
    return xs[j].reshape(1, -1), float(zs[j])


class ContinuousFidelityKG:
    """Continuous-fidelity knowledge gradient (`Continuous/CFKG.py:11-140`).

    Random (x, z) candidates; per candidate, fantasize an observation at
    (x, z), retrain the surrogate (caller-supplied ``fantasy_max_fn``),
    and score the gain in max top-fidelity posterior mean per unit cost;
    pick the argmax (`CFKG.py:33-70,113-119`).

    ``fantasy_max_fn(x (1,d), z) -> float`` returns the max top-fidelity
    posterior mean over a reference grid after adding the fantasized
    observation — the analog of the reference's retrain-then-predict
    (`CFKG.py:62-64`).
    """

    def __init__(
        self,
        x_dimension: int,
        search_range,
        posterior_fn: Callable,
        fantasy_max_fn: Callable,
        cost,
        seed: int = 0,
        n_candidates: int = 20,
        n_grid: int = 100,
    ):
        self.x_dimension = x_dimension
        self.search_range = search_range
        self.posterior_fn = posterior_fn
        self.fantasy_max_fn = fantasy_max_fn
        self.cost = cost
        self.seed = seed
        self.xs, self.zs = _candidate_grid(
            jax.random.PRNGKey(seed + 86), search_range, x_dimension, n_candidates
        )
        self.grid, _ = _candidate_grid(
            jax.random.PRNGKey(seed + 117), search_range, x_dimension, n_grid
        )

    def compute_next(self) -> Tuple[np.ndarray, float]:
        z_top = float(self.search_range[-1][-1])
        mean, _ = self.posterior_fn(jnp.asarray(self.grid), z_top)
        base = float(jnp.max(mean))
        best, new_x, new_z = -np.inf, self.xs[0:1], float(self.zs[0])
        for i in range(len(self.zs)):
            x_i = self.xs[i].reshape(1, -1)
            after = float(self.fantasy_max_fn(x_i, float(self.zs[i])))
            kg = (after - base) / max(float(self.cost.compute_cost(self.zs[i])), 1e-9)
            if kg > best:
                best, new_x, new_z = kg, x_i, float(self.zs[i])
        return new_x, new_z
