"""Warm-started spectral tracking for symmetric eigendecompositions.

Why this exists (measured on the v5e, scripts/profile_hogp.py): the
HOGP/GAR Kronecker NLML needs the eigendecomposition of the n x n input
Gram every training step, and XLA:TPU's ``jnp.linalg.eigh`` is a QDWH
spectral divide-and-conquer whose work loop pops one subproblem at a
time (jax/_src/tpu/linalg/eigh.py) — ~48 ms of the 51 ms hogp1024 step
is that one eigh.  The one-shot Jacobi custom call is 3x slower still
at n=1024 (scripts/measure_eigh_quick.py).

Inside an Adam training scan, however, K changes by O(lr) per step, so
the previous step's eigenbasis nearly diagonalizes the new K.  This
module tracks the eigenbasis across steps with pure MXU work:

    B = V_prev^T K V_prev                 (Rayleigh-Ritz, 2 GEMMs)
    repeat `sweeps` times:
        t_ij = exact 2x2 Jacobi tangent of (diag(B), B_ij)
        Q    = orthonormalize(I + S)      (2 Newton-Schulz steps, GEMMs)
        B    = Q^T B Q;  V = V Q
    w = diag(B)

The exact-tangent formula t = 2E*sgn(diff)/(|diff| + sqrt(diff^2+4E^2))
reduces to the first-order E/diff for well-separated eigenvalues and
saturates at |t| = 1 (45 degrees) for clusters — degenerate directions
rotate instead of blowing up (the F-matrix 1/(lam_i - lam_j) failure of
autodiff-through-eigh does not occur).  A Frobenius cap on S keeps
I + S inside the Newton-Schulz convergence ball.

Staleness is bounded by a scheduled FULL eigh refresh every
``refresh_every`` steps (K-FAC-style amortization).  The refresh
predicate must depend only on the scan step — never on per-restart
values — so that under vmapped restarts `lax.cond` stays a real branch
(a batched predicate would lower to `select` and pay the batched eigh
every step).

Accuracy is observable: `jacobi_refine` returns the relative
off-diagonal residual ||B - diag(B)||_F / ||B||_F, which callers thread
through training as a running max (tests pin it on realistic
trajectories).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

_P = lax.Precision.HIGHEST

# Frobenius cap on the simultaneous-rotation generator: singular values
# of Q = I + S are sqrt(1 + sigma(S)^2) <= sqrt(1 + MAX_S_NORM^2).  The
# Newton-Schulz map x(3-x^2)/2 overshoots hard above ~1.3 (f(1.56)=0.44),
# so the cap keeps sigma(Q) <= 1.22 where three steps reach ~1e-6
# orthogonality even for saturated cluster rotations.
_MAX_S_NORM = 0.7


def _ns_orthonormalize(Q: jnp.ndarray, steps: int = 3) -> jnp.ndarray:
    """Newton-Schulz polar iteration Q <- Q (3I - Q^T Q) / 2.

    For Q = I + S with skew S and ||S||_2 <= 0.7 the iteration converges
    to the orthogonal polar factor; three steps leave ||Q^T Q - I|| at
    the 1e-6 class even for saturated cluster rotations, and far below
    that for warm-start-sized S.
    """
    I = jnp.eye(Q.shape[-1], dtype=Q.dtype)
    for _ in range(steps):
        G = jnp.matmul(Q.T, Q, precision=_P)
        Q = jnp.matmul(Q, 1.5 * I - 0.5 * G, precision=_P)
    return Q


def jacobi_refine(
    K: jnp.ndarray, V: jnp.ndarray, sweeps: int = 1
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Refine an approximate eigenbasis ``V`` of symmetric ``K``.

    Returns ``(w, V', res)`` with ``K ~= V' diag(w) V'^T``,
    ``res = ||off(B)||_F / ||B||_F`` the relative residual AFTER the
    final sweep.  All heavy ops are HIGHEST-precision GEMMs.
    """
    B = jnp.matmul(
        jnp.matmul(V.T, K, precision=_P), V, precision=_P
    )
    n = B.shape[0]
    I = jnp.eye(n, dtype=B.dtype)

    for _ in range(sweeps):
        d = jnp.diagonal(B)
        E = B - jnp.diag(d)
        diff = d[None, :] - d[:, None]  # d_j - d_i at (i, j)
        sgn = jnp.where(diff >= 0, 1.0, -1.0).astype(B.dtype)
        denom = jnp.abs(diff) + jnp.sqrt(diff * diff + 4.0 * E * E)
        t = jnp.where(denom > 0, 2.0 * E * sgn / jnp.maximum(denom, 1e-30), 0.0)
        # S must be EXACTLY skew: at eigenvalue ties diff == 0 makes
        # sgn = +1 on both (i,j) and (j,i), which would yield a symmetric
        # S (and NS would then collapse V's orthogonality).  Take the
        # upper triangle as canonical and antisymmetrize.
        t = jnp.triu(t, 1)
        t = t - t.T
        # cap the simultaneous-rotation norm for NS convergence
        s_norm = jnp.sqrt(jnp.sum(t * t))
        t = t * jnp.minimum(1.0, _MAX_S_NORM / jnp.maximum(s_norm, 1e-30))
        Q = _ns_orthonormalize(I + t)
        B = jnp.matmul(
            jnp.matmul(Q.T, B, precision=_P), Q, precision=_P
        )
        V = jnp.matmul(V, Q, precision=_P)

    w = jnp.diagonal(B)
    off = B - jnp.diag(w)
    res = jnp.sqrt(jnp.sum(off * off)) / jnp.maximum(
        jnp.sqrt(jnp.sum(B * B)), 1e-30
    )
    return w, V, res


def tracked_eigh(
    K: jnp.ndarray,
    V_prev: jnp.ndarray,
    step: jnp.ndarray,
    refresh_every: int = 64,
    sweeps: int = 1,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Eigendecomposition with warm-start tracking and scheduled refresh.

    Every ``refresh_every``-th ``step`` (including step 0, which
    bootstraps an identity/garbage ``V_prev``) pays the full
    ``jnp.linalg.eigh``; other steps refine ``V_prev`` with
    ``sweeps`` simultaneous-Jacobi sweeps (GEMMs only, ~25x cheaper at
    n=1024).  ``step`` MUST be the scan's step counter (unbatched under
    vmap) — see module docstring.

    Returns ``(w, V, res)``; ``res`` is 0.0 on refresh steps.
    """
    step = jnp.asarray(step)

    def refresh(_):
        w, V = jnp.linalg.eigh(K)
        return w, V, jnp.zeros((), K.dtype)

    def track(_):
        return jacobi_refine(K, V_prev, sweeps=sweeps)

    return lax.cond(
        (step % refresh_every) == 0, refresh, track, operand=None
    )


def tracked_eigh_adaptive(
    K: jnp.ndarray,
    V_prev: jnp.ndarray,
    last_res: jnp.ndarray,
    step: jnp.ndarray,
    max_gap: int = 128,
    res_threshold: float = 0.05,
    sweeps: int = 1,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """RESIDUAL-GATED refresh: pay the full eigh when the PREVIOUS step's
    tracking residual exceeded ``res_threshold`` (one step of staleness in
    the gate), with ``max_gap`` as a scheduled upper bound and step 0
    bootstrapping.

    UNBATCHED TRAINING ONLY: the predicate depends on ``last_res``, a
    per-trajectory value — under vmapped restarts this `cond` would lower
    to a `select` that pays the batched eigh every step (see module
    docstring).  The static-schedule `tracked_eigh` remains the vmapped
    path; the adaptive gate exists for single-trajectory large-n training
    where drift, not the calendar, should buy refreshes
    (BASELINE.md "tracked-spectrum schedule frontier").
    """
    step = jnp.asarray(step)

    def refresh(_):
        w, V = jnp.linalg.eigh(K)
        return w, V, jnp.zeros((), K.dtype)

    def track(_):
        return jacobi_refine(K, V_prev, sweeps=sweeps)

    pred = jnp.logical_or(
        (step % max_gap) == 0, last_res > res_threshold
    )
    return lax.cond(pred, refresh, track, operand=None)
