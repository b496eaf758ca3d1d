"""Covariance kernels as pure functions over parameter pytrees.

TPU-native re-design of the reference kernel zoo
(`GaussianProcess/kernel.py:23-347` and the legacy
`MFGP_ver2023May/kernel/SE_kernel.py:4-44`): each kernel is a *static*,
hashable spec object carrying no arrays, with

    params = spec.init_params(input_dim)        # pytree of jnp arrays
    K      = spec(params, x1, x2)               # (n1, n2) Gram block

Static specs close over jit safely; parameter pytrees ride through
`jax.grad` / `optax` / `vmap` untouched.  Pairwise squared distances are
computed via the quadratic expansion ``|a|^2 + |b|^2 - 2 a.b`` so the heavy
term is a single MXU matmul (the reference uses `torch.cdist`, which is
bandwidth-bound; the expansion is the TPU-friendly formulation) with a
clamp at zero for numerical safety.

Positivity parametrizations follow the reference exactly:
  * ARD / Matern:  ``length_scale = |raw| + eps``, ``variance = |raw|``
    (`kernel.py:100-105,150`)
  * SquaredExponential (scalar): ``exp`` parametrization
    (`kernel.py:253-272`)
"""

from __future__ import annotations

import dataclasses
import jax
import jax.numpy as jnp

EPS = 1e-9


def sq_dist(x1: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
    """Pairwise squared Euclidean distances via one MXU matmul.

    ``x1: (n1, d), x2: (n2, d) -> (n1, n2)``, clamped at zero.

    The cross term MUST run at full f32 matmul precision: the TPU MXU
    default rounds inputs to bfloat16, and the quadratic expansion
    ``|x|^2 + |x'|^2 - 2 x.x'`` cancels catastrophically — for |x| ~ 20
    a bf16-rounded cross term puts O(1) absolute errors on O(1) squared
    distances, visibly corrupting every Gram (and making ill-conditioned
    Sigmas indefinite).  d is small for GP inputs, so full precision here
    is free (n^2 d flops).
    """
    n1 = jnp.sum(x1 * x1, axis=-1)[:, None]
    n2 = jnp.sum(x2 * x2, axis=-1)[None, :]
    # preferred_element_type follows the INPUT dtype: pinning f32 here
    # would silently downcast the x64_factor escape-hatch path's f64
    # Grams back to f32 accuracy (measured: indefinite beyond the nugget)
    cross = jnp.dot(x1, x2.T, precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=x1.dtype)
    return jnp.maximum(n1 + n2 - 2.0 * cross, 0.0)


def median_heuristic(x, max_rows: int = 256) -> jnp.ndarray:
    """Per-dimension median of pairwise |x_i - x_j| — the standard
    length-scale initialization heuristic.  Subsamples rows to bound the
    O(n^2) cost."""
    x = jnp.asarray(x)
    if x.shape[0] > max_rows:
        idx = jnp.linspace(0, x.shape[0] - 1, max_rows).astype(jnp.int32)
        x = x[idx]
    diffs = jnp.abs(x[:, None, :] - x[None, :, :])
    med = jnp.median(diffs.reshape(-1, x.shape[-1]), axis=0)
    return jnp.maximum(med, 1e-3)


class Kernel:
    """Base class: static spec; subclasses define init_params/apply."""

    def init_params(self, input_dim: int):
        raise NotImplementedError

    def apply(self, params, x1, x2):
        raise NotImplementedError

    def __call__(self, params, x1, x2):
        return self.apply(params, x1, x2)

    def diag(self, params, x):
        """Diagonal of ``apply(params, x, x)`` without forming the matrix.

        Subclasses override with an O(n) formula where one exists.
        """
        return jnp.diagonal(self.apply(params, x, x))

    def set_lengthscales(self, params, ls: jnp.ndarray):
        """Return params with length scales set to ``ls`` (per-dim vector),
        respecting the kernel's own parametrization.  Identity for kernels
        without a length-scale concept.  Used to build restart-ladder
        initializations (`train/fit.py:gp_restart_batch`)."""
        return params


@dataclasses.dataclass(frozen=True)
class ARDKernel(Kernel):
    """SE kernel with per-dimension length scales (`kernel.py:65-105`).

    k(x, x') = |sv| * exp(-0.5 * ||x/ls - x'/ls||^2),  ls = |raw_ls| + eps
    """

    eps: float = EPS

    def init_params(self, input_dim: int):
        return {
            "length_scales": jnp.ones((input_dim,), jnp.float32),
            "signal_variance": jnp.ones((1,), jnp.float32),
        }

    def apply(self, params, x1, x2):
        ls = jnp.abs(params["length_scales"]) + self.eps
        d2 = sq_dist(x1 / ls, x2 / ls)
        return jnp.abs(params["signal_variance"][0]) * jnp.exp(-0.5 * d2)

    def diag(self, params, x):
        sv = jnp.abs(params["signal_variance"][0])
        return jnp.full((x.shape[0],), sv, x.dtype)

    def set_lengthscales(self, params, ls):
        out = dict(params)
        ls = jnp.asarray(ls, jnp.float32).reshape(-1)
        shape = params["length_scales"].shape
        if ls.shape[0] != shape[0]:
            # e.g. HOGP shares a dim-1 kernel across modes: collapse to mean
            ls = jnp.full(shape, jnp.mean(ls), jnp.float32)
        out["length_scales"] = ls
        return out


@dataclasses.dataclass(frozen=True)
class SquaredExponentialKernel(Kernel):
    """Scalar-length-scale SE kernel, exp parametrization (`kernel.py:239-272`).

    k(x, x') = exp(sv)^2 * exp(-0.5 * ||x - x'||^2 / exp(ls)^2)

    This is the default kernel in most reference demos and experiments.
    """

    def init_params(self, input_dim: int):
        del input_dim
        return {
            "length_scale": jnp.ones((1,), jnp.float32),
            "signal_variance": jnp.ones((1,), jnp.float32),
        }

    def apply(self, params, x1, x2):
        d2 = sq_dist(x1, x2)
        ls2 = jnp.exp(params["length_scale"][0]) ** 2
        sv2 = jnp.exp(params["signal_variance"][0]) ** 2
        return sv2 * jnp.exp(-0.5 * d2 / ls2)

    def diag(self, params, x):
        sv2 = jnp.exp(params["signal_variance"][0]) ** 2
        return jnp.full((x.shape[0],), sv2, x.dtype)

    def set_lengthscales(self, params, ls):
        # scalar LOG-parametrized length scale
        out = dict(params)
        out["length_scale"] = jnp.log(
            jnp.mean(jnp.asarray(ls, jnp.float32))
        ).reshape(1)
        return out


@dataclasses.dataclass(frozen=True)
class MaternKernel(Kernel):
    """Matern kernel with ARD length scales and nu in {0.5, 1.5, 2.5}
    (`kernel.py:109-169`).  `nu`/`rho` are static (non-trainable), matching
    the reference.
    """

    nu: float = 2.5
    rho: float = 1.0
    eps: float = EPS

    def init_params(self, input_dim: int):
        return {
            "length_scales": jnp.ones((input_dim,), jnp.float32),
            "signal_variance": jnp.ones((1,), jnp.float32),
        }

    def apply(self, params, x1, x2):
        ls = jnp.abs(params["length_scales"]) + self.eps
        d2 = sq_dist(x1 / ls, x2 / ls)
        sv = jnp.abs(params["signal_variance"][0])
        # sqrt has infinite grad at 0; add tiny floor inside the root.
        if self.nu == 0.5:
            d = jnp.sqrt(d2 + self.eps)
            return sv * jnp.exp(-d / self.rho)
        elif self.nu == 1.5:
            d = jnp.sqrt(3.0 * d2 + self.eps)
            return sv * (1.0 + d / self.rho) * jnp.exp(-d / self.rho)
        elif self.nu == 2.5:
            d = jnp.sqrt(5.0 * d2 + self.eps)
            return (
                sv
                * (1.0 + d / self.rho + (5.0 / 3.0) * d2 / self.rho**2)
                * jnp.exp(-d / self.rho)
            )
        raise ValueError(f"nu must be one of 0.5/1.5/2.5, got {self.nu}")

    def set_lengthscales(self, params, ls):
        out = dict(params)
        ls = jnp.asarray(ls, jnp.float32).reshape(-1)
        shape = params["length_scales"].shape
        if ls.shape[0] != shape[0]:
            # e.g. HOGP shares a dim-1 kernel across modes: collapse to mean
            ls = jnp.full(shape, jnp.mean(ls), jnp.float32)
        out["length_scales"] = ls
        return out


@dataclasses.dataclass(frozen=True)
class LinearKernel(Kernel):
    """Linear kernel with per-dim scales and center (`kernel.py:23-63`).

    k(x, x') = |sv| * <(x - c)/ls, (x' - c)/ls>
    """

    def init_params(self, input_dim: int):
        return {
            "length_scales": jnp.ones((input_dim,), jnp.float32),
            "signal_variance": jnp.ones((1,), jnp.float32),
            "center": jnp.zeros((input_dim,), jnp.float32),
        }

    def apply(self, params, x1, x2):
        ls = params["length_scales"]
        c = params["center"]
        z1 = (x1 - c) / ls
        z2 = (x2 - c) / ls
        # full precision: bf16-rounded inputs put O(4e-3) relative errors
        # directly on the kernel values (see sq_dist)
        return jnp.abs(params["signal_variance"][0]) * jnp.dot(
            z1, z2.T, precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )


@dataclasses.dataclass(frozen=True)
class RationalQuadraticKernel(Kernel):
    """RQ kernel, scalar length scale (`kernel.py:275-310`)."""

    def init_params(self, input_dim: int):
        del input_dim
        return {
            "length_scale": jnp.ones((1,), jnp.float32),
            "signal_variance": jnp.ones((1,), jnp.float32),
            "alpha": jnp.ones((1,), jnp.float32),
        }

    def apply(self, params, x1, x2):
        d2 = sq_dist(x1, x2)
        ls, sv, alpha = (
            params["length_scale"][0],
            params["signal_variance"][0],
            params["alpha"][0],
        )
        return sv**2 * jnp.power(1.0 + 0.5 * d2 / (alpha * ls**2), -alpha)


@dataclasses.dataclass(frozen=True)
class SumKernel(Kernel):
    """k1 + k2 (`kernel.py:172-203`)."""

    k1: Kernel
    k2: Kernel

    def init_params(self, input_dim: int):
        return {
            "k1": self.k1.init_params(input_dim),
            "k2": self.k2.init_params(input_dim),
        }

    def apply(self, params, x1, x2):
        return self.k1.apply(params["k1"], x1, x2) + self.k2.apply(
            params["k2"], x1, x2
        )

    def diag(self, params, x):
        return self.k1.diag(params["k1"], x) + self.k2.diag(params["k2"], x)

    def set_lengthscales(self, params, ls):
        return {
            "k1": self.k1.set_lengthscales(params["k1"], ls),
            "k2": self.k2.set_lengthscales(params["k2"], ls),
        }


@dataclasses.dataclass(frozen=True)
class ProductKernel(Kernel):
    """k1 * k2 (`kernel.py:205-236`)."""

    k1: Kernel
    k2: Kernel

    def init_params(self, input_dim: int):
        return {
            "k1": self.k1.init_params(input_dim),
            "k2": self.k2.init_params(input_dim),
        }

    def apply(self, params, x1, x2):
        return self.k1.apply(params["k1"], x1, x2) * self.k2.apply(
            params["k2"], x1, x2
        )

    def diag(self, params, x):
        return self.k1.diag(params["k1"], x) * self.k2.diag(params["k2"], x)

    def set_lengthscales(self, params, ls):
        return {
            "k1": self.k1.set_lengthscales(params["k1"], ls),
            "k2": self.k2.set_lengthscales(params["k2"], ls),
        }


@dataclasses.dataclass(frozen=True)
class MCFidelityKernel(Kernel):
    """Monte-Carlo integrated fidelity kernel for ContinuAR
    (`FidelityFusion_Models/CAR_ContinuousAutoRegression.py:14-69`).

    Multiplies a base kernel over x by a scalar factor obtained by MC
    integration over the fidelity variable z in [lf, hf]:

        factor = mean_z[ exp(-b (z1 - hf) - b (z2 - hf) - 0.5 (z1-z2)^2/ls^2) ]
                 * (hf - lf)^2

    The reference reseeds the *global* torch RNG on every kernel call
    (seed=105).  Here the MC z-draws are precomputed once from an explicit
    PRNG key at init (fixed across training, like the reference) and stored
    as non-trainable constants in the param pytree under "_z" — a stateless
    design that keeps the kernel pure.

    ``b`` is shared across fidelities in CAR; it is passed through the
    param pytree so that one global parameter can be broadcast in.
    """

    base: Kernel
    lf: float = 0.0
    hf: float = 1.0
    n_mc: int = 100
    seed: int = 105
    eps: float = 1e-3

    def init_params(self, input_dim: int):
        key = jax.random.PRNGKey(self.seed)
        k1, k2 = jax.random.split(key)
        z1 = jax.random.uniform(k1, (self.n_mc,)) * (self.hf - self.lf) + self.lf
        z2 = jax.random.uniform(k2, (self.n_mc,)) * (self.hf - self.lf) + self.lf
        return {
            "base": self.base.init_params(input_dim),
            "length_scales": jnp.ones((input_dim,), jnp.float32),
            "signal_variance": jnp.ones((1,), jnp.float32),
            "b": jnp.asarray(1.0, jnp.float32),
            "_z": (z1, z2),  # fixed MC samples (non-trainable by convention)
        }

    def fidelity_factor(self, params):
        ls = jnp.abs(params["length_scales"]) + self.eps
        z1, z2 = params["_z"]
        b = params["b"]
        dist_z = (z1 / ls[0] - z2 / ls[0]) ** 2
        expo = -b * (z1 - self.hf) - b * (z2 - self.hf) - 0.5 * dist_z
        z_part = jnp.exp(jnp.minimum(expo, 20.0))  # overflow guard
        return jnp.mean(z_part) * (self.hf - self.lf) * (self.hf - self.lf)

    def apply(self, params, x1, x2):
        factor = self.fidelity_factor(params)
        sv = jnp.abs(params["signal_variance"][0])
        return sv * factor * self.base.apply(params["base"], x1, x2)

    def set_lengthscales(self, params, ls):
        out = dict(params)
        out["base"] = self.base.set_lengthscales(params["base"], ls)
        return out


@dataclasses.dataclass(frozen=True)
class MaternKernelScalarLengthScale(Kernel):
    """Deprecated scalar-length-scale Matern variant
    (`kernel.py:312-347`): k = sv^2 * (1 + sqrt(3 d2)/ls^2)^(-nu)."""

    def init_params(self, input_dim: int):
        del input_dim
        return {
            "length_scale": jnp.ones((1,), jnp.float32),
            "signal_variance": jnp.ones((1,), jnp.float32),
            "nu": jnp.asarray([2.5], jnp.float32),
        }

    def apply(self, params, x1, x2):
        d2 = sq_dist(x1, x2)
        ls, sv, nu = (
            params["length_scale"][0],
            params["signal_variance"][0],
            params["nu"][0],
        )
        return sv**2 * jnp.power(1.0 + jnp.sqrt(3.0 * d2 + EPS) / ls**2, -nu)


def trainable_mask(kernel: Kernel, params) -> dict:
    """Pytree of bools marking trainable leaves (entries under keys starting
    with "_" are frozen constants, e.g. MC samples)."""

    def walk(subtree, frozen):
        if isinstance(subtree, dict):
            return {
                k: walk(v, frozen or k.startswith("_")) for k, v in subtree.items()
            }
        return jax.tree_util.tree_map(lambda _: not frozen, subtree)

    return walk(params, False)
