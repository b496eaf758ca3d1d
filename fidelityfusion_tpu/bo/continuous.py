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
