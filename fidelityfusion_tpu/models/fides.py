"""FIDES: continuous-fidelity GP over fidelity intervals.

TPU-native re-design of `MFGP_ver2023May/base_gp/fides.py:21-152` with the
MC-integrated residual kernel `MFGP_ver2023May/kernel/MCMC_res_kernel.py:5-69`
(`Kernel_res`): a GP whose kernel takes *fidelity interval bounds*
``(l1, h1, l2, h2)`` — k(x,x'; bounds) = SE(x,x') * F_mc(bounds) — used as
CAR's residual GP and as the continuous-fidelity BO surrogate
(`Experiments/MFBO_continuous/MF_BO_continuous.py:8,16`).

Parametrization follows the reference's exp format: length_scale / scale /
length_scale_z stored as logs; ``b`` raw; noise = exp(raw)^{-1}
(`MFGP_ver2023May/utils/gp_noise.py:9-25`).  The MC z-draws use a fixed
explicit PRNG (the reference reseeds the global RNG with seed 1024 on
every kernel call, `MCMC_res_kernel.py:47`).

Unlike the legacy module this model stores no training data; callers pass
(x, y) explicitly (the current-stack philosophy, `gp_basic.py:16-19`).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from fidelityfusion_tpu.ops import linalg
from fidelityfusion_tpu.ops.kernels import sq_dist

JITTER = linalg.JITTER


class FidelityBounds(NamedTuple):
    l1: float
    h1: float
    l2: float
    h2: float


@dataclasses.dataclass(frozen=True)
class FIDES:
    """Static spec; params hold the kernel + noise parameters."""

    n_mc: int = 100
    seed: int = 1024
    jitter: float = JITTER

    def init_params(self, input_dim: int):
        del input_dim  # scalar (log) length scale, reference SE_kernel style
        key = jax.random.PRNGKey(self.seed)
        k1, k2 = jax.random.split(key)
        return {
            "log_length_scale": jnp.zeros((1,), jnp.float32),
            "log_scale": jnp.zeros((1,), jnp.float32),
            "log_length_scale_z": jnp.zeros((1,), jnp.float32),
            "b": jnp.asarray(1.0, jnp.float32),
            "log_noise": jnp.zeros((1,), jnp.float32),
            "_u": (
                jax.random.uniform(k1, (self.n_mc,)),
                jax.random.uniform(k2, (self.n_mc,)),
            ),
        }

    def kernel(self, params, x1, x2, bounds: FidelityBounds) -> jnp.ndarray:
        """`Kernel_res.forward` (`MCMC_res_kernel.py:33-69`)."""
        ls = jnp.exp(params["log_length_scale"][0])
        scale = jnp.exp(params["log_scale"][0])
        lz = jnp.exp(params["log_length_scale_z"][0])
        b = params["b"]
        u1, u2 = params["_u"]
        z1 = u1 * (bounds.h1 - bounds.l1) + bounds.l1
        z2 = u2 * (bounds.h2 - bounds.l2) + bounds.l2
        dist_z = (z1 / lz - z2 / lz) ** 2
        z_part = jnp.exp(
            -b * (z1 - bounds.h1) - b * (z2 - bounds.h2) - 0.5 * dist_z
        )
        factor = (
            jnp.mean(z_part) * (bounds.h1 - bounds.l1) * (bounds.h2 - bounds.l2)
        )
        K = scale * jnp.exp(-0.5 * sq_dist(x1 / ls, x2 / ls))
        return factor * K

    def noise(self, params) -> jnp.ndarray:
        # GP_noise_box exp format: noise = exp(raw); used as noise^{-1}
        # (`fides.py:96,143`)
        return 1.0 / jnp.exp(params["log_noise"][0])

    def nll(
        self,
        params,
        x: jnp.ndarray,
        y: jnp.ndarray,
        bounds: FidelityBounds,
        mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        K = self.kernel(params, x, x, bounds)
        Sigma = linalg.assemble_sigma(
            K, self.noise(params), jitter=self.jitter, mask=mask
        )
        return linalg.mvn_nll(Sigma, y, mask=mask)

    def predict(
        self,
        params,
        x_train: jnp.ndarray,
        y_train: jnp.ndarray,
        x_test: jnp.ndarray,
        bounds: FidelityBounds,
        mask: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Mean and diagonal variance (+noise), matching `fides.py:74-110`."""
        K = self.kernel(params, x_train, x_train, bounds)
        Sigma = linalg.assemble_sigma(
            K, self.noise(params), jitter=self.jitter, mask=mask
        )
        K_s = self.kernel(params, x_train, x_test, bounds)
        k_ss = jnp.diagonal(self.kernel(params, x_test, x_test, bounds))
        mean, var = linalg.posterior_diag(Sigma, y_train, K_s, k_ss, mask=mask)
        return mean, (var + self.noise(params)).reshape(-1, 1)

    def predict_full(
        self,
        params,
        x_train: jnp.ndarray,
        y_train: jnp.ndarray,
        x_test: jnp.ndarray,
        bounds: FidelityBounds,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Posterior mean and FULL covariance over joint (x, z) test points
        — needed by the continuous knowledge gradient's cross-fidelity
        fantasy conditioning (`bo/continuous.py:continuous_best_observed_kg`).
        """
        K = self.kernel(params, x_train, x_train, bounds)
        Sigma = linalg.assemble_sigma(K, self.noise(params), jitter=self.jitter)
        K_s = self.kernel(params, x_train, x_test, bounds)
        K_ss = self.kernel(params, x_test, x_test, bounds)
        L = jnp.linalg.cholesky(Sigma)
        V = jax.scipy.linalg.solve_triangular(L, K_s, lower=True)
        alpha = jax.scipy.linalg.cho_solve((L, True), y_train.reshape(-1, 1))
        mean = K_s.T @ alpha
        cov = K_ss - V.T @ V
        return mean.reshape(-1), cov
