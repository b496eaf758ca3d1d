"""Dense Gaussian-process linear algebra: jittered Cholesky, NLML, posterior.

TPU-native replacement for the reference's torch.linalg call sites
(`GaussianProcess/gp_computation_pack.py:34-136`, `cigp_v10.py:50-69`):
Gram -> jittered Cholesky -> triangular solves -> log-det, fused under jit
so XLA schedules the whole NLML as one program.

All entry points take an optional boolean ``mask`` over training rows so
that callers can pad datasets to static shapes (the TPU-first answer to
the reference's dynamically growing residual/BO datasets): masked-out rows
are replaced by identity rows of the covariance and zero targets, which
leaves the likelihood and posterior of the valid rows *exactly* unchanged.

Conventions (matching the reference formulas):
  * ``nll`` is the positive negative-log-marginal-likelihood summed over
    output columns (`cigp_v10.py:67-68`):
        0.5*sum(gamma^2) + D*sum(log diag L) + 0.5*n*D*log(2*pi)
  * jitter: ``JITTER`` absolute (`cigp_v10.py:13`), with an optional
    relative-jitter mode ``JITTER * mean(diag K)``
    (`gp_computation_pack.py:125-126`) for f32 conditioning on TPU.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.scipy.linalg import cho_solve, cholesky as _cholesky, solve_triangular

import math

JITTER = 1e-6
LOG2PI = math.log(2.0 * math.pi)


def assemble_sigma(
    K: jnp.ndarray,
    noise: jnp.ndarray,
    jitter: float = JITTER,
    y_var: Optional[jnp.ndarray] = None,
    mask: Optional[jnp.ndarray] = None,
    relative_jitter: bool = False,
) -> jnp.ndarray:
    """Build Sigma = K + noise*I + jitter*I (+ diag(y_var)), masked.

    ``noise`` is the scalar observation-noise *variance*.  ``y_var`` is an
    optional per-row known observation variance (vector of length n) — the
    reference's ``y = [mean, var]`` convention (`cigp_v10.py:59-60`; only
    the diagonal of the var matrix enters the likelihood there).

    With ``mask``, rows/cols of padded entries become identity rows, which
    makes Cholesky/solves/log-det of the padded system agree exactly with
    the unpadded one.
    """
    n = K.shape[0]
    if relative_jitter:
        jit_val = jitter * jnp.mean(jnp.diagonal(K))
    else:
        jit_val = jnp.asarray(jitter, K.dtype)
    diag_extra = noise + jit_val
    if y_var is not None:
        diag_extra = diag_extra + y_var
    if mask is None:
        return K + jnp.eye(n, dtype=K.dtype) * diag_extra
    m = mask.astype(K.dtype)
    Km = K * (m[:, None] * m[None, :])
    diag_vals = jnp.where(mask, jnp.diagonal(Km) + diag_extra, 1.0)
    return Km - jnp.diag(jnp.diagonal(Km)) + jnp.diag(diag_vals)


def cholesky(Sigma: jnp.ndarray) -> jnp.ndarray:
    """Lower Cholesky factor."""
    return _cholesky(Sigma, lower=True)


def mvn_nll(
    Sigma: jnp.ndarray,
    y: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    method: str = "cholesky",
) -> jnp.ndarray:
    """Negative log marginal likelihood of y ~ N(0, Sigma), columns summed.

    Matches `cigp_v10.py:61-68` / `gp_computation_pack.py:65-80` with
    ``Kinv_method='cholesky3'`` semantics (each output column treated as an
    independent sample of the same MVN).  ``method`` keeps the reference's
    selectable inversion paths (`gp_computation_pack.py:34-91`):
    'cholesky' (= the reference's cholesky1/2/3, all mathematically the
    triangular-solve form — the fastest and default) or 'direct'
    (explicit solve + slogdet, the reference's 'direct' branch; useful for
    numerical cross-checks).
    """
    y = jnp.atleast_2d(y)
    if y.ndim == 1:
        y = y[:, None]
    d = y.shape[1]
    if mask is not None:
        y = y * mask[:, None].astype(y.dtype)
        n_eff = jnp.sum(mask).astype(y.dtype)
    else:
        n_eff = jnp.asarray(y.shape[0], y.dtype)
    if method == "direct":
        sign, logdet = jnp.linalg.slogdet(Sigma)
        quad = 0.5 * jnp.sum(y * jnp.linalg.solve(Sigma, y))
        return quad + 0.5 * d * logdet + 0.5 * n_eff * d * LOG2PI
    L = cholesky(Sigma)
    gamma = solve_triangular(L, y, lower=True)
    quad = 0.5 * jnp.sum(gamma**2)
    # padded rows have L_ii = 1 -> log contribution 0
    logdet_half = jnp.sum(jnp.log(jnp.diagonal(L)))
    return quad + d * logdet_half + 0.5 * n_eff * d * LOG2PI


def posterior(
    Sigma: jnp.ndarray,
    y: jnp.ndarray,
    K_s: jnp.ndarray,
    K_ss: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact GP posterior mean and *full* covariance at test points.

    mu  = K_s^T Sigma^{-1} y
    cov = K_ss - v^T v,   v = L^{-1} K_s

    (reference `cigp_v10.py:34-44`, `gp_computation_pack.py:103-110`).
    ``K_s`` is (n_train, n_test).  With ``mask``, padded training rows are
    zeroed out of ``K_s``/``y`` and contribute nothing.
    """
    if mask is not None:
        m = mask.astype(K_s.dtype)
        K_s = K_s * m[:, None]
        y = y * m[:, None]
    L = cholesky(Sigma)
    alpha = cho_solve((L, True), y)
    mu = K_s.T @ alpha
    v = solve_triangular(L, K_s, lower=True)
    cov = K_ss - v.T @ v
    return mu, cov


def posterior_diag(
    Sigma: jnp.ndarray,
    y: jnp.ndarray,
    K_s: jnp.ndarray,
    k_ss_diag: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Posterior mean and diagonal-only variance (O(n^2 m) instead of m^2).

    TPU-friendly fast path for BO acquisition scoring, where only marginal
    variances are needed (the reference always forms the full n_te x n_te
    covariance, `cigp_v10.py:41`).
    """
    if mask is not None:
        m = mask.astype(K_s.dtype)
        K_s = K_s * m[:, None]
        y = y * m[:, None]
    L = cholesky(Sigma)
    alpha = cho_solve((L, True), y)
    mu = K_s.T @ alpha
    v = solve_triangular(L, K_s, lower=True)
    var = jnp.maximum(k_ss_diag - jnp.sum(v**2, axis=0), 0.0)
    return mu, var


def posterior_cache(Sigma: jnp.ndarray, y: jnp.ndarray,
                    mask: Optional[jnp.ndarray] = None) -> dict:
    """Precompute the per-dataset factorization for repeated posterior
    evaluation: ``{"W": inv(L), "alpha": Sigma^{-1} y}``.

    The reference re-runs the O(n^3) Cholesky of every stage on EVERY
    prediction call (`AR_autoRegression.py:56-89` via `cigp_v10.py:35` —
    SURVEY §3.2 flags this), which a BO loop multiplies by hundreds of
    acquisition evaluations.  Train data is frozen once a posterior is
    exported, so the factor is computed once here; each later call is
    GEMM-only (`posterior_diag_cached`): on TPU that also replaces the
    per-call triangular solve (~13 TFLOP/s on v5e) with a GEMM against W
    (`ops/blocked.py:tri_inv_gemm` assembly, ~59-155 TFLOP/s).
    """
    from fidelityfusion_tpu.ops.blocked import tri_inv_gemm

    if mask is not None:
        y = y * mask[:, None].astype(y.dtype)
    L = cholesky(Sigma)
    W = tri_inv_gemm(L)
    gamma = jnp.matmul(W, y, precision=jax.lax.Precision.HIGHEST)
    alpha = jnp.matmul(W.T, gamma, precision=jax.lax.Precision.HIGHEST)
    return {"W": W, "alpha": alpha, "logdiagL": jnp.log(jnp.diagonal(L))}


def posterior_diag_cached(
    cache: dict,
    K_s: jnp.ndarray,
    k_ss_diag: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """`posterior_diag` from a precomputed `posterior_cache` — no
    factorization, GEMM-only: mu = K_s^T alpha, v = W K_s."""
    if mask is not None:
        K_s = K_s * mask[:, None].astype(K_s.dtype)
    mu = jnp.matmul(K_s.T, cache["alpha"],
                    precision=jax.lax.Precision.HIGHEST)
    v = jnp.matmul(cache["W"], K_s, precision=jax.lax.Precision.HIGH)
    var = jnp.maximum(k_ss_diag - jnp.sum(v**2, axis=0), 0.0)
    return mu, var


def posterior_cached(
    cache: dict,
    K_s: jnp.ndarray,
    K_ss: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """`posterior` (full test covariance) from a precomputed cache."""
    if mask is not None:
        K_s = K_s * mask[:, None].astype(K_s.dtype)
    mu = jnp.matmul(K_s.T, cache["alpha"],
                    precision=jax.lax.Precision.HIGHEST)
    v = jnp.matmul(cache["W"], K_s, precision=jax.lax.Precision.HIGH)
    cov = K_ss - jnp.matmul(v.T, v, precision=jax.lax.Precision.HIGH)
    return mu, cov


@jax.custom_vjp
def mvn_nll_fused(Sigma: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """NLML with a hand-written VJP (SURVEY.md §7 hard-part #5).

    Forward: one Cholesky + triangular solve (same math as `mvn_nll`).
    Backward: the closed-form gradient

        dL/dSigma = 0.5 * (d * Sigma^{-1} - alpha alpha^T),   alpha = Sigma^{-1} y
        dL/dy     = alpha

    computed from the SAVED factor — XLA's autodiff instead differentiates
    through the Cholesky primitive (Walter's blocked recurrence), which
    re-materializes triangular intermediates; the closed form is one
    `cho_solve` against I plus one rank-d update.  Gradients agree with
    autodiff to f32 tolerance (tests/test_linalg.py).
    """
    L = cholesky(Sigma)
    gamma = solve_triangular(L, y, lower=True)
    d = y.shape[1]
    n = y.shape[0]
    return (
        0.5 * jnp.sum(gamma**2)
        + d * jnp.sum(jnp.log(jnp.diagonal(L)))
        + 0.5 * n * d * LOG2PI
    )


def _mvn_nll_fused_fwd(Sigma, y):
    L = cholesky(Sigma)
    gamma = solve_triangular(L, y, lower=True)
    d = y.shape[1]
    n = y.shape[0]
    val = (
        0.5 * jnp.sum(gamma**2)
        + d * jnp.sum(jnp.log(jnp.diagonal(L)))
        + 0.5 * n * d * LOG2PI
    )
    return val, (L, y)


def _mvn_nll_fused_bwd(res, g):
    L, y = res
    d = y.shape[1]
    alpha = cho_solve((L, True), y)
    Kinv = cho_solve((L, True), jnp.eye(L.shape[0], dtype=L.dtype))
    dSigma = g * 0.5 * (d * Kinv - alpha @ alpha.T)
    return dSigma, g * alpha


mvn_nll_fused.defvjp(_mvn_nll_fused_fwd, _mvn_nll_fused_bwd)


@partial(jax.jit, static_argnames=("lower",))
def chol_logdet(Sigma: jnp.ndarray, lower: bool = True) -> jnp.ndarray:
    """log|Sigma| via Cholesky."""
    L = _cholesky(Sigma, lower=lower)
    return 2.0 * jnp.sum(jnp.log(jnp.diagonal(L)))


def pad_rows(a: jnp.ndarray, n_padded: int) -> jnp.ndarray:
    """Zero-pad the leading axis of ``a`` to length ``n_padded``."""
    pad = [(0, n_padded - a.shape[0])] + [(0, 0)] * (a.ndim - 1)
    return jnp.pad(a, pad)


def row_mask(n_valid: int, n_padded: int) -> jnp.ndarray:
    """Boolean mask with the first ``n_valid`` of ``n_padded`` entries True."""
    return jnp.arange(n_padded) < n_valid
