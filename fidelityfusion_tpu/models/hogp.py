"""HOGP: High-Order GP for tensor-valued outputs via Kronecker structure.

TPU-native re-design of `GaussianProcess/hogp_simple.py:21-121` (and the
config-driven `MFGP_ver2023May/base_gp/hogp.py`): the covariance over the
flattened output ``vec(Y)`` is ``K_0(x,x) (x) K_1 (x) ... (x) K_M`` where
``K_m`` are Grams over per-output-mode integer grids.  The Kronecker
matrix (size n*prod(d_m)) is never materialized: the NLML uses per-mode
symmetric eigendecompositions

    Sigma = (V_0 (x) ... (x) V_M) diag(A) (V_0 (x) ... (x) V_M)^T,
    A[i_0..i_M] = prod_m lambda_m[i_m] + noise

and everything reduces to chains of per-mode matmuls (MXU-friendly
``multi_mode_dot``).  Noise parametrization matches the reference:
``noise = noise_variance^{-1}`` (`hogp_simple.py:96`).

Differences from the reference (deliberate):
  * The reference's `forward` depends on state cached by the *last*
    `log_likelihood` call (`hogp_simple.py:46-71` uses `self.K/self.A/self.g`).
    Here `nll_with_state` returns an explicit `HOGPState` that `predict`
    consumes — pure-functional, jit/vmap-safe.
  * The reference's predictive variance formula (`hogp_simple.py:62-69`)
    *adds* an `A^1`-weighted eigen term to the prior diagonal, which is not
    the GP posterior variance.  We implement the exact posterior variance
    diag(K_**) - diag(K_*^T Sigma^{-1} K_*) through the same eigenbasis.
  * All mode kernels share one parameter set, as in the reference (which
    appends the *same* kernel module for every mode, `hogp_simple.py:29-31`).
"""

from __future__ import annotations

import dataclasses
from typing import List, NamedTuple, Optional, Tuple

import jax.numpy as jnp

from fidelityfusion_tpu.ops import linalg
from fidelityfusion_tpu.ops.kernels import Kernel
from fidelityfusion_tpu.ops.kron import (
    eigh_pairs,
    kron_nlml,
    multi_mode_dot,
    rank1_tucker,
)

JITTER = linalg.JITTER


class HOGPState(NamedTuple):
    """Posterior cache produced by the NLML pass (explicit version of the
    reference's `self.K/K_eigen/A/g` attributes)."""

    K_modes: tuple  # mode Grams K_1..K_M (d_m, d_m)
    eigvecs: tuple  # V_0..V_M
    eigvals: tuple  # lambda_0..lambda_M
    A: jnp.ndarray  # eigenvalue tensor + noise, shape (n, d_1..d_M)
    g: jnp.ndarray  # Sigma^{-1} y reshaped as a tensor


@dataclasses.dataclass(frozen=True)
class HOGP:
    """Static spec for the high-order GP.

    ``learnable_grid`` / ``learnable_map`` mirror `hogp_simple.py:22-43`:
    when enabled, the per-mode grid coordinates and/or a per-mode mapping
    matrix become trainable parameters (both default off, matching the
    reference demos).  Disabled variants keep the constants out of the
    param pytree entirely so the optimizer never sees them.
    """

    kernel: Kernel
    output_shape: Tuple[int, ...]
    jitter: float = JITTER
    learnable_grid: bool = False
    learnable_map: bool = False

    def init_params(self, input_dim: int, noise_variance: float = 1.0):
        del input_dim  # mode kernels share params; ls of dim 1 broadcasts
        p = {
            "kernel": self.kernel.init_params(1),
            "noise_variance": jnp.asarray([noise_variance], jnp.float32),
        }
        if self.learnable_grid:
            p["grids"] = [
                jnp.arange(d, dtype=jnp.float32).reshape(-1, 1)
                for d in self.output_shape
            ]
        if self.learnable_map:
            p["maps"] = [
                jnp.eye(d, dtype=jnp.float32) for d in self.output_shape
            ]
        return p

    def grids(self, params=None) -> List[jnp.ndarray]:
        """Per-mode grid coordinates (`hogp_simple.py:32-43`): integer
        grids by default; trainable (optionally map-transformed) when the
        learnable flags are set."""
        if self.learnable_grid and params is not None and "grids" in params:
            gs = params["grids"]
        else:
            gs = [
                jnp.arange(d, dtype=jnp.float32).reshape(-1, 1)
                for d in self.output_shape
            ]
        if self.learnable_map and params is not None and "maps" in params:
            gs = [m @ g for m, g in zip(params["maps"], gs)]
        return gs

    def noise(self, params) -> jnp.ndarray:
        # reference: noise_variance.pow(-1) (`hogp_simple.py:96`)
        return 1.0 / params["noise_variance"][0]

    def nll_with_state(
        self,
        params,
        x_train: jnp.ndarray,
        y_train: jnp.ndarray,
        y_var: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, HOGPState]:
        """Per-element-normalized NLML (`hogp_simple.py:73-113`) and the
        posterior state.  ``y_train`` has shape (n, d_1, ..., d_M);
        ``y_var`` an optional per-sample observed-noise vector added to the
        diagonal of K_0 (the reference adds a full matrix, `:83-84`)."""
        kp = params["kernel"]
        K0 = self.kernel.apply(kp, x_train, x_train)
        if y_var is not None:
            K0 = K0 + jnp.diag(y_var)
        K0 = K0 + self.jitter * jnp.eye(K0.shape[0], dtype=K0.dtype)
        lam0, V0 = eigh_pairs(K0)
        K_modes, eigvals, eigvecs = [], [lam0], [V0]
        for g in self.grids(params):
            Km = self.kernel.apply(kp, g, g)
            lam, V = eigh_pairs(Km)
            K_modes.append(Km)
            eigvals.append(lam)
            eigvecs.append(V)

        # PSD clamp: f32 eigh negatives blow up through the Kronecker
        # product on TPU (see ops/kron.py:_clamp_psd)
        from fidelityfusion_tpu.ops.kron import _clamp_psd

        eigvals = _clamp_psd(eigvals)
        A = rank1_tucker(eigvals) + self.noise(params)
        T1 = multi_mode_dot(y_train, [V.T for V in eigvecs])
        # b^T b with orthogonal back-rotation == sum(T1^2 / A)
        quad = jnp.sum(T1**2 / A)
        g_tensor = multi_mode_dot(T1 / A, list(eigvecs))

        nd = float(jnp.size(y_train))
        loss = 0.5 * (
            nd * jnp.log(2.0 * jnp.pi) + jnp.sum(jnp.log(A)) + quad
        )
        loss = loss / nd  # reference normalizes by element count (:107-112)
        state = HOGPState(
            K_modes=tuple(K_modes),
            eigvecs=tuple(eigvecs),
            eigvals=tuple(eigvals),
            A=A,
            g=g_tensor,
        )
        return loss, state

    def _grams(self, params, x_train, y_var=None):
        kp = params["kernel"]
        K0 = self.kernel.apply(kp, x_train, x_train)
        if y_var is not None:
            K0 = K0 + jnp.diag(y_var)
        K0 = K0 + self.jitter * jnp.eye(K0.shape[0], dtype=K0.dtype)
        K_modes = [self.kernel.apply(kp, g, g) for g in self.grids(params)]
        return K0, K_modes

    def nll(self, params, x_train, y_train, y_var=None) -> jnp.ndarray:
        """Training-loop NLML: same value as ``nll_with_state`` but through
        the custom-VJP Kronecker NLML (`ops/kron.py:kron_nlml`), whose
        backward reuses the forward eigenpairs — mode-product GEMMs only,
        no second eigh (the `hogp1024` backward bottleneck)."""
        K0, K_modes = self._grams(params, x_train, y_var)
        return kron_nlml(tuple([K0] + K_modes), y_train, self.noise(params))

    def tracking_aux0(self, n: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Initial aux carry for `nll_tracked`: (V0, max_res).  V0 is the
        identity — step 0 of the schedule always pays the full eigh, so
        the bootstrap content never matters."""
        return (jnp.eye(n, dtype=jnp.float32), jnp.zeros((), jnp.float32))

    def nll_tracked(
        self,
        params,
        aux,
        step,
        x_train,
        y_train,
        y_var=None,
        refresh_every: int = 64,
        sweeps: int = 1,
    ):
        """Training-loop NLML with the mode-0 eigendecomposition tracked
        across scan steps (`ops/kron.py:tracked_kron_nlml`): XLA:TPU's
        serial QDWH eigh is ~48 of the 51 ms hogp1024 step; warm-started
        Jacobi refinement replaces it with MXU GEMMs on all but every
        ``refresh_every``-th step (K-FAC-style amortized decomposition).

        Default 64: the round-4 on-chip schedule sweep (BASELINE.md
        "tracked-spectrum schedule frontier") measured 64 at the same
        end-of-training parity class as 32 (|dnll| ~2.6e-4 vs 2.7e-4
        over 48 steps at n=1024) for +15% throughput (209 vs 181
        steps/s); 128 adds only +7% more while doubling the stale
        window.  For unbatched training prefer `nll_tracked_adaptive`
        (residual-gated: pays refreshes on drift, not the calendar).

        ``aux = (V_prev, max_res)`` threads the eigenbasis and the
        running max of the tracking residual through the scan (use
        `train.fit.adam_scan_aux` / ``fit(..., aux0=...)``); ``step`` is
        the scan's float step counter.  Same signature contract as
        `nll` otherwise; value/gradients agree with `nll` to within the
        tracked residual (pinned by tests/test_hogp_gar.py).
        """
        from fidelityfusion_tpu.ops.kron import tracked_kron_nlml

        V_prev, max_res = aux
        K0, K_modes = self._grams(params, x_train, y_var)
        loss, V_new, res = tracked_kron_nlml(refresh_every, sweeps)(
            tuple([K0] + K_modes), y_train, self.noise(params), V_prev, step
        )
        return loss, (V_new, jnp.maximum(max_res, res))

    def tracking_aux0_adaptive(self, n: int):
        """Initial aux for `nll_tracked_adaptive`: (V0, max_res, last_res)."""
        return (jnp.eye(n, dtype=jnp.float32), jnp.zeros((), jnp.float32),
                jnp.zeros((), jnp.float32))

    def nll_tracked_adaptive(
        self,
        params,
        aux,
        step,
        x_train,
        y_train,
        y_var=None,
        max_gap: int = 128,
        res_threshold: float = 0.05,
        sweeps: int = 1,
    ):
        """`nll_tracked` with the RESIDUAL-GATED refresh
        (`ops/kron.py:tracked_kron_nlml_adaptive`): the full eigh is paid
        when the previous step's tracking residual exceeded
        ``res_threshold`` (staleness-driven), bounded by ``max_gap``.
        UNBATCHED training only — under vmapped restarts the gate's
        per-trajectory predicate degrades `cond` to `select` (use
        `nll_tracked`'s static schedule there).

        ``aux = (V_prev, max_res, last_res)`` (`tracking_aux0_adaptive`).
        """
        from fidelityfusion_tpu.ops.kron import tracked_kron_nlml_adaptive

        V_prev, max_res, last_res = aux
        K0, K_modes = self._grams(params, x_train, y_var)
        loss, V_new, res = tracked_kron_nlml_adaptive(
            max_gap, res_threshold, sweeps
        )(
            tuple([K0] + K_modes), y_train, self.noise(params), V_prev,
            last_res, step,
        )
        return loss, (V_new, jnp.maximum(max_res, res), res)

    def predict(
        self,
        params,
        state: HOGPState,
        x_train: jnp.ndarray,
        x_test: jnp.ndarray,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Posterior mean and diagonal variance, shapes (m, d_1..d_M).

        mean = K_* Sigma^{-1} vec(y)  via mode products with the cached g
        (`hogp_simple.py:52`); variance is the exact posterior diagonal
        computed in the shared eigenbasis.
        """
        kp = params["kernel"]
        K_star = self.kernel.apply(kp, x_test, x_train)  # (m, n)
        mean = multi_mode_dot(state.g, [K_star] + list(state.K_modes))

        # prior diagonal: k(x*,x*) outer diag(K_1) outer ... diag(K_M)
        diag_x = self.kernel.diag(kp, x_test)
        prior_diag = rank1_tucker(
            [diag_x] + [jnp.diagonal(Km) for Km in state.K_modes]
        )

        # explained term: multi_mode_dot(1/A, [(K_* V_0)^2, (K_m V_m)^2 ...])
        P0 = (K_star @ state.eigvecs[0]) ** 2
        P_modes = [
            (Km @ V) ** 2 for Km, V in zip(state.K_modes, state.eigvecs[1:])
        ]
        explained = multi_mode_dot(1.0 / state.A, [P0] + P_modes)
        var_diag = jnp.maximum(prior_diag - explained, 1e-12) + self.noise(params)
        return mean, var_diag
