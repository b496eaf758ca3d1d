"""Analytic-gradient SE NLML: the large-n training hot path, GEMM-only.

The generic NLML backward (hybrid path, `ops/blocked.py:mvn_nll_hybrid`)
materializes K^{-1} = W^T W (2n^3 flops) plus several n^2 intermediates
(alpha alpha^T, dSigma, and the Gram build's VJP chain).  For the scalar
SE kernel — the workhorse of every reference demo/experiment
(`GaussianProcess/kernel.py:239-272`, `cigp_v10.py:61-68`) — the three
hyperparameter gradients have closed forms that need only ONE extra GEMM
beyond the factorization:

    Sigma = e^{2u} exp(-d^2 e^{-2t} / 2) + (e^{-b} + jitter) I
    G     = dNLL/dSigma = (D * Sigma^{-1} - A A^T) / 2,  A = Sigma^{-1} Y

    dNLL/db = -e^{-b} tr(G)
       with  tr(Sigma^{-1})   = ||W||_F^2               (free given W)
             ||A||_F^2, <A,Y>                            (free)
    dNLL/du = 2 <G, K>
       with  tr(Sigma^{-1} K) = n - c tr(Sigma^{-1})     (free)
             sum_j a_j^T K a_j = <A,Y> - c ||A||_F^2     (free)
    dNLL/dt = <G, M>,   M = K . d^2 e^{-2t}
       with  tr(Sigma^{-1} M) = sum((W @ M) . W)         (ONE 2n^3 GEMM)
             sum_j a_j^T M a_j = <A, M A>                (n^2 d)

Total O(n^3): cholesky (n^3/3) + inv(L) (`tri_inv_gemm`, GEMM-assembled)
+ W@M — vs the hybrid path's extra W^T W and its n^2 cotangent chain.
Measured on v5e at n=4096: 4.3 ms/step vs 6.8 (hybrid) vs 11.9 (fused
custom VJP) — see BASELINE.md roofline table.

CAVEAT: ``x`` and the forward value are exact, but the custom VJP returns
a ZERO cotangent for x (training never differentiates the NLML wrt inputs;
acquisition optimization differentiates `predict`, not `nll`).  `CIGP.nll`
only dispatches here for the scalar-SE kernel with no mask/y_var.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

from fidelityfusion_tpu.ops.blocked import _mm, chol_inv_padded

LOG2PI = math.log(2.0 * math.pi)


def _se_sigma_parts(params, x, jitter, min_noise=0.0):
    """XLA Gram build.  A Pallas VMEM gram was trialed here in round 3 and
    RETIRED (benchmarks/retired/pallas_gram.py): round-2's 0.04/0.13 ms
    claims came from a bf16 in-kernel dot whose quadratic expansion was
    numerically WRONG on-chip (max err ~0.9); with the dot fixed to f32
    the kernel times ~par standalone (0.21 vs 0.13 ms, overlapping
    spreads) and LOSES 0.6 ms/step inside the fused NLML scan (5.46 vs
    4.83 ms at n=4096 — the opaque kernel boundary blocks XLA fusion).
    Measured 2026-08-19, quiet box, median-of-5 chain-difference."""
    t = params["kernel"]["length_scale"][0]
    u = params["kernel"]["signal_variance"][0]
    b = params["log_beta"][0]
    # f32 RELATIVE nugget floor: mean(diag K) = e^{2u} exactly for SE
    # (models/cigp.py:CIGP.min_noise rationale)
    c = jnp.maximum(jnp.exp(-b), min_noise * jnp.exp(2.0 * u)) + jitter
    n = x.shape[0]
    n1 = jnp.sum(x * x, axis=-1)[:, None]
    # full-precision cross term: the bf16 MXU default catastrophically
    # cancels in the quadratic expansion (see kernels.py:sq_dist)
    cross = jnp.dot(x, x.T, precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32)
    d2 = jnp.maximum(n1 + n1.T - 2.0 * cross, 0.0)
    K = jnp.exp(2.0 * u) * jnp.exp(-0.5 * d2 * jnp.exp(-2.0 * t))
    Sigma = K + c * jnp.eye(n, dtype=x.dtype)
    return K, c, Sigma


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def se_nlml(params, x, y, jitter=1e-6, precision="high",
            factor="xla", grad_precision="default", min_noise=0.0):
    """NLML of y ~ N(0, SE-Gram + noise I), columns summed — value matches
    `linalg.mvn_nll_fused` on the same Sigma; gradients wrt ``params`` and
    ``y`` are analytic (see module docstring); the x cotangent is ZERO.

    ``params`` is the CIGP param dict {"kernel": {"length_scale",
    "signal_variance"}, "log_beta"}; ``y`` must be (n, d).
    """
    val, _ = _se_nlml_fwd(params, x, y, jitter, precision, factor,
                          grad_precision, min_noise)
    return val


def _se_nlml_fwd(params, x, y, jitter, precision, factor,
                 grad_precision=None, min_noise=0.0):
    n, d = y.shape
    K, c, Sigma = _se_sigma_parts(params, x, jitter, min_noise)
    # one-pass (L, W): 1.48 ms at n=4096 vs 3.15 for chol + tri_inv
    L, W = chol_inv_padded(Sigma, precision=precision, factor=factor)
    gamma = _mm(W, y, "highest")
    val = (
        0.5 * jnp.sum(gamma**2)
        + d * jnp.sum(jnp.log(jnp.diagonal(L)))
        + 0.5 * n * d * LOG2PI
    )
    return val, (params, x, K, c, W, gamma, y)


def _se_nlml_bwd(jitter, precision, factor, grad_precision, min_noise,
                 res, g):
    params, x, K, c, W, gamma, y = res
    n, d = y.shape
    t = params["kernel"]["length_scale"][0]
    b = params["log_beta"][0]

    A = _mm(W.T, gamma, "highest")       # Sigma^{-1} Y, (n, d)
    tr_inv = jnp.sum(W * W)              # tr(Sigma^{-1})
    a_sq = jnp.sum(A * A)                # ||A||_F^2
    a_y = jnp.sum(A * y)                 # sum_j a_j^T y_j

    # d/db:  dSigma/db = -e^{-b} I, ZERO when the nugget floor is active;
    # when clamped the floor min_noise*e^{2u} contributes to d/du instead
    u = params["kernel"]["signal_variance"][0]
    floor = min_noise * jnp.exp(2.0 * u)
    active = (jnp.exp(-b) >= floor).astype(jnp.float32)
    tr_G = 0.5 * (d * tr_inv - a_sq)
    g_b = -active * jnp.exp(-b) * tr_G

    # d/du:  dK/du = 2K
    tr_SK = n - c * tr_inv               # tr(Sigma^{-1} K)
    aKa = a_y - c * a_sq                 # sum_j a_j^T K a_j
    g_u = 2.0 * 0.5 * (d * tr_SK - aKa) + (1.0 - active) * 2.0 * floor * tr_G

    # d/dt:  M = K . d2 e^{-2t}, with d2 e^{-2t} recovered from K itself
    # (K = e^{2u} exp(-0.5 d2 e^{-2t}) => d2 e^{-2t} = 2(2u - log K)); this
    # drops the n^2 d2 residual from the forward.  Entries where K
    # underflowed have M -> 0 (K decays faster than d2 grows); max(.,0)
    # also clamps the roundoff negatives on the diagonal.
    M = 2.0 * K * jnp.maximum(
        2.0 * u - jnp.log(jnp.maximum(K, jnp.finfo(K.dtype).tiny)), 0.0
    )
    gp_prec = grad_precision or precision
    tr_SM = jnp.sum(_mm(W, M, gp_prec) * W)   # the one extra GEMM
    aMa = jnp.sum(A * (M @ A))
    g_t = 0.5 * (d * tr_SM - aMa)

    g_params = {
        "kernel": {
            "length_scale": (g * g_t).reshape(1),
            "signal_variance": (g * g_u).reshape(1),
        },
        "log_beta": (g * g_b).reshape(1),
    }
    # extra param entries (e.g. frozen constants) get zero cotangents
    extra = {
        k: jax.tree_util.tree_map(jnp.zeros_like, v)
        for k, v in params.items() if k not in ("kernel", "log_beta")
    }
    kextra = {
        k: jax.tree_util.tree_map(jnp.zeros_like, v)
        for k, v in params["kernel"].items()
        if k not in ("length_scale", "signal_variance")
    }
    g_params["kernel"].update(kextra)
    g_params.update(extra)
    # x cotangent: ZERO by design (see module docstring)
    return g_params, jnp.zeros_like(x), g * A


se_nlml.defvjp(_se_nlml_fwd, _se_nlml_bwd)
