"""Blocked Cholesky + triangular inverse designed for *batched* NLML.

Motivation (BASELINE.md): XLA's batched Cholesky nearly serializes over
the batch on a single TPU core (R=32, n=1024 costs ~26x one
factorization), which caps vmapped hyperparameter restarts — the
framework's replacement for the reference's single fixed-init Adam
(`FidelityFusion_Models/AR_autoRegression.py:104`).  Two Pallas attempts
(now `benchmarks/retired/pallas_batched.py`, `.../pallas_cholesky.py`) lost to XLA because
their per-panel VPU chains dominate.

This module takes a third route, pure JAX, shaped so that `vmap` turns
every O(n^3) term into *batched GEMMs* (MXU) and leaves only an O(n)
critical path of cheap vectorized leaf steps:

  * right-looking blocked factorization: per panel, a fused leaf loop
    factors the diagonal block AND accumulates its inverse (one
    elementary-matrix inverse per column — same rank-1 shape as the
    Cholesky update itself), so the panel solve is a GEMM against
    `inv(L_kk)` instead of a (serializing) batched triangular solve;
  * Schur updates are GEMMs;
  * the full `inv(L)` is assembled from the per-block inverses by a
    divide-and-conquer block rule `inv([[A,0],[B,C]]) =
    [[iA,0],[-iC B iA, iC]]` — two large GEMMs per level;
  * NLML forward and its closed-form VJP then consist only of GEMMs
    against `W = inv(L)` (`gamma = W y`, `Kinv = W^T W`), eliminating the
    batched triangular-solve / cho_solve calls entirely.

Use `mvn_nll_blocked` wherever a *batch* of moderate-n likelihoods is
trained (vmapped restarts); for a single large factorization XLA's
`cholesky` remains faster (its panel pipeline beats our O(n) leaf chain
when there is no batch to amortize it over).
"""

from __future__ import annotations

import math
from functools import partial
from typing import List, Tuple

import jax
import jax.numpy as jnp
from jax import lax

LOG2PI = math.log(2.0 * math.pi)


def _leaf_chol_inv(D: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Unblocked Cholesky of a [b, b] SPD block, fused with its inverse.

    One `fori_loop` over columns; per step a rank-1 trailing update (the
    factorization) and a rank-1 row update (left-multiplying the running
    inverse by the elementary factor's inverse).  Written for a single
    matrix so `vmap` batches every step over the restart axis.
    """
    b = D.shape[-1]
    idx = jnp.arange(b)

    def step(j, carry):
        a, w = carry
        d = jnp.sqrt(a[j, j])
        col = a[:, j] / d
        below = idx > j
        colm = jnp.where(below, col, jnp.zeros_like(col))
        newcol = jnp.where(idx == j, d, jnp.where(below, col, a[:, j]))
        a = a.at[:, j].set(newcol)
        a = a - colm[:, None] * colm[None, :]
        # W <- inv(E_j) @ W : row j scaled, rows below get -L_rj/d * row_j
        wj = w[j, :] / d
        w = w.at[j, :].set(wj)
        w = w - colm[:, None] * wj[None, :]
        return a, w

    a, w = lax.fori_loop(0, b, step, (D, jnp.eye(b, dtype=D.dtype)))
    return jnp.tril(a), w


def _leaf_chol_inv_xla(D: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Leaf via XLA's cholesky + triangular solve (measurement variant)."""
    Ld = jnp.linalg.cholesky(D)
    Wd = jax.scipy.linalg.solve_triangular(
        Ld, jnp.eye(D.shape[-1], dtype=D.dtype), lower=True
    )
    return Ld, Wd


PRECISIONS = {
    "default": lax.Precision.DEFAULT,
    "high": lax.Precision.HIGH,
    "highest": lax.Precision.HIGHEST,
}


def _mm(a, b, precision):
    return jnp.matmul(a, b, precision=PRECISIONS[precision])


def _tri_inv_assemble(
    L: jnp.ndarray, diag_invs: List[jnp.ndarray], block: int,
    precision: str = "high",
) -> jnp.ndarray:
    """inv(L) from its per-block diagonal inverses, divide-and-conquer.

    GEMM precision matters on TPU: the MXU default rounds inputs to
    bfloat16 (measured 145 TFLOP/s vs 59 at bf16x3 "high" / 31 at f32
    "highest" for n=4096), and bf16 inverse-assembly visibly corrupts
    W = inv(L) for ill-conditioned GP Grams (NaN factorizations on real
    SE Grams) — precision is a caller-visible knob defaulting to "high"
    (bf16x3: accuracy within 2x of full f32 at 2x the speed; on-chip
    matrix in BASELINE.md "TPU matmul precision")."""
    nb = len(diag_invs)
    if nb == 1:
        return diag_invs[0]
    hb = nb // 2
    h = hb * block
    W1 = _tri_inv_assemble(L[:h, :h], diag_invs[:hb], block, precision)
    W2 = _tri_inv_assemble(L[h:, h:], diag_invs[hb:], block, precision)
    W21 = -_mm(W2, _mm(L[h:, :h], W1, precision), precision)
    z = jnp.zeros((h, L.shape[-1] - h), dtype=L.dtype)
    return jnp.block([[W1, z], [W21, W2]])


@partial(jax.jit, static_argnames=("block", "leaf", "precision"))
def blocked_chol_inv(
    A: jnp.ndarray, block: int = 64, leaf: str = "fused",
    precision: str = "high",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Lower Cholesky factor L of SPD ``A`` and W = inv(L).

    ``A`` is [n, n] with n a multiple of ``block`` (callers pad with
    identity rows otherwise — see `mvn_nll_blocked`).  vmap-compatible:
    all slicing is static, all O(n^3) terms are matmuls.

    ``leaf`` selects how diagonal blocks are factored/inverted:
      * ``"fused"`` — fori_loop rank-1 sweep (best under vmap: every step
        batches over the restart axis);
      * ``"xla"`` — XLA cholesky + triangular solve per diagonal block;
      * ``"hybrid"`` — factor the WHOLE matrix with XLA's (fast, pipelined)
        cholesky, then build W = inv(L) from batched diagonal-block
        inverses + the divide-and-conquer GEMM assembly.  For a SINGLE
        large matrix this replaces the O(n^3) triangular solves of the
        standard NLML VJP (~13 TFLOP/s on v5e) with GEMMs (~155 TFLOP/s)
        while keeping XLA's single-matrix factorization speed — the
        un-batched large-n counterpart of the vmapped "fused" path.
    """
    n = A.shape[-1]
    if n % block:
        raise ValueError(f"n={n} not a multiple of block={block}")
    if leaf == "v2":
        return blocked_chol_inv_v2(A, block=block, precision=precision)
    if leaf == "v2f":
        return blocked_chol_inv_v2(A, block=block, precision=precision,
                                   leaf="fused")
    if leaf == "hybrid":
        L = jnp.linalg.cholesky(A)
        nb = n // block
        dblocks = jnp.stack(
            [L[k * block:(k + 1) * block, k * block:(k + 1) * block]
             for k in range(nb)]
        )
        eye = jnp.eye(block, dtype=A.dtype)
        Wd = jax.vmap(
            lambda Ld: jax.scipy.linalg.solve_triangular(Ld, eye, lower=True)
        )(dblocks)
        W = _tri_inv_assemble(L, [Wd[k] for k in range(nb)], block,
                              precision)
        return L, W
    leaf_fn = _leaf_chol_inv if leaf == "fused" else _leaf_chol_inv_xla
    L = jnp.zeros_like(A)
    A_work = A
    diag_invs: List[jnp.ndarray] = []
    for k in range(n // block):
        s = k * block
        e = s + block
        Ld, Wd = leaf_fn(A_work[s:e, s:e])
        diag_invs.append(Wd)
        L = L.at[s:e, s:e].set(Ld)
        if e < n:
            L21 = _mm(A_work[e:, s:e], Wd.T, precision)
            L = L.at[e:, s:e].set(L21)
            A_work = A_work.at[e:, e:].add(-_mm(L21, L21.T, precision))
    W = _tri_inv_assemble(L, diag_invs, block, precision)
    return L, W


def blocked_cholesky(A: jnp.ndarray, block: int = 64) -> jnp.ndarray:
    """Lower Cholesky factor only (testing / drop-in comparisons)."""
    return blocked_chol_inv(A, block=block)[0]


@partial(jax.jit, static_argnames=("block", "precision", "leaf"))
def blocked_chol_inv_v2(
    A: jnp.ndarray, block: int = 128, precision: str = "high",
    leaf: str = "xla",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """COPY-MINIMIZED blocked (L, W = inv(L)) — round 5 (VERDICT r4
    weak #3).

    Mathematically identical to `blocked_chol_inv(leaf="xla")`; the
    difference is pure data movement, which dominates the vmapped
    restart step on TPU: the v1 layout performs ~24 FULL-matrix
    `.at[].set/.add` updates per factorization (each one copies the
    whole (R, n, n) buffer under vmap — ~3 GB of HBM traffic at R=32,
    n=1024, swamping the ~1.3 ms of actual GEMM flops).  Here:

      * the trailing Schur submatrix is carried EXPLICITLY with
        shrinking static shapes (the k-loop is Python-unrolled), so the
        per-panel update writes only the live (n-kb)^2 trailing block —
        total Schur traffic ~ n^3/(3b) elements instead of 8 n^2;
      * each column block of L is built as one concatenation; L itself
        is assembled by a single zero-padded concat at the end (one n^2
        write instead of 16).

    The leaf factorization stays XLA's batched small-block cholesky (it
    batches perfectly over vmapped restarts at (R, b, b)).
    """
    n = A.shape[-1]
    if n % block:
        raise ValueError(f"n={n} not a multiple of block={block}")
    nb = n // block
    eye = jnp.eye(block, dtype=A.dtype)
    cols = []
    diag_invs: List[jnp.ndarray] = []
    trail = A
    leaf_fn = _leaf_chol_inv if leaf == "fused" else None
    for k in range(nb):
        D = trail[:block, :block]
        if leaf_fn is not None:
            # fused rank-1 sweep: every step batches over vmapped
            # restarts (XLA's batched small cholesky serializes — the
            # measured wall of the restart step, BASELINE.md r5)
            Ld, Wd = leaf_fn(D)
        else:
            Ld = jnp.linalg.cholesky(D)
            Wd = jax.scipy.linalg.solve_triangular(Ld, eye, lower=True)
        diag_invs.append(Wd)
        if trail.shape[0] > block:
            A21 = trail[block:, :block]
            L21 = _mm(A21, Wd.T, precision)
            cols.append(jnp.concatenate([Ld, L21], axis=0))
            trail = trail[block:, block:] - _mm(L21, L21.T, precision)
        else:
            cols.append(Ld)
    Lcols = [
        jnp.concatenate(
            [jnp.zeros((k * block, block), A.dtype), c], axis=0
        ) if k else c
        for k, c in enumerate(cols)
    ]
    L = jnp.concatenate(Lcols, axis=1)
    W = _tri_inv_assemble(L, diag_invs, block, precision)
    return L, W


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _nll_blocked_core(Sigma, y, block, leaf):
    L, W = blocked_chol_inv(Sigma, block=block, leaf=leaf)
    gamma = _mm(W, y, "highest")
    d = y.shape[1]
    n = y.shape[0]
    return (
        0.5 * jnp.sum(gamma**2)
        + d * jnp.sum(jnp.log(jnp.diagonal(L)))
        + 0.5 * n * d * LOG2PI
    )


def _nll_blocked_fwd(Sigma, y, block, leaf):
    L, W = blocked_chol_inv(Sigma, block=block, leaf=leaf)
    gamma = _mm(W, y, "highest")
    d = y.shape[1]
    n = y.shape[0]
    val = (
        0.5 * jnp.sum(gamma**2)
        + d * jnp.sum(jnp.log(jnp.diagonal(L)))
        + 0.5 * n * d * LOG2PI
    )
    return val, (W, gamma)


def _nll_blocked_bwd(block, leaf, res, g):
    W, gamma = res
    d = gamma.shape[1]
    alpha = _mm(W.T, gamma, "highest")
    # gradient-only GEMM at the fast default precision (see
    # _nll_hybrid_bwd / BASELINE.md convergence check)
    Kinv = _mm(W.T, W, "default")
    dSigma = g * 0.5 * (d * Kinv - alpha @ alpha.T)
    return dSigma, g * alpha


_nll_blocked_core.defvjp(_nll_blocked_fwd, _nll_blocked_bwd)


def hybrid_block(n: int) -> int:
    """Block policy for the single-matrix hybrid path (live v5e; updated
    2026-08-19 round 2): full NLML+grad+Adam steps at n=4096 measured
    8.19 ms (block 256), 6.81 (512), **4.50 (1024)** — the larger diagonal
    blocks trade a slightly slower isolated tri_inv for far fewer
    assembly levels inside the fused step graph.  n=512-2048 keep 256
    (n=512: 0.166 ms, n=1024: 0.370, n=2048: 1.187 vs fused-VJP 0.181 /
    0.462 / 1.719)."""
    return 256 if n <= 2048 else 1024


def chol_inv_padded(Sigma: jnp.ndarray, block: int = 0,
                    precision: str = "high", factor: str = "blocked"):
    """One-pass (L, W = inv(L)) for a SINGLE SPD matrix via the blocked
    right-looking factorization with XLA leaves (`blocked_chol_inv`,
    leaf='xla'), identity-padded to a block multiple and cropped.

    Live v5e, n=4096 f32: **1.48 ms** (block 512) for BOTH L and W vs
    3.15 ms for XLA `cholesky` + `tri_inv_gemm` — producing W during the
    factorization reuses the per-block inverses the panel solves need
    anyway, so the separate O(n^3) inverse pass disappears.  (block 1024:
    3.55 ms, 2048: 2.36 — fewer/larger XLA leaf factorizations lose.)
    """
    n = Sigma.shape[-1]
    if factor == "xla":
        # exact f32 factorization (XLA's internal chol), GEMM-assembled
        # inverse at the requested precision
        L = jnp.linalg.cholesky(Sigma)
        return L, tri_inv_gemm(L, block=block, precision=precision)
    if not block:
        block = 512 if n >= 512 else 64
    n_pad = -(-n // block) * block
    if n_pad != n:
        extra = n_pad - n
        Sigma = jnp.pad(Sigma, ((0, extra), (0, extra)))
        Sigma = Sigma + jnp.diag(
            jnp.pad(jnp.zeros((n,), Sigma.dtype), (0, extra),
                    constant_values=1.0)
        )
    L, W = blocked_chol_inv(Sigma, block=block, leaf="xla",
                            precision=precision)
    return L[:n, :n], W[:n, :n]


def tri_inv_gemm(L: jnp.ndarray, block: int = 0,
                 precision: str = "high") -> jnp.ndarray:
    """W = inv(L) for lower-triangular ``L`` via batched diagonal-block
    inverses + divide-and-conquer GEMM assembly — no O(n^3) triangular
    solve anywhere (on v5e trsm runs ~13 TFLOP/s vs ~155 for GEMM).

    Arbitrary n: L is identity-padded to a block multiple FIRST, so the
    padding costs only GEMM FLOPs in the assembly (inv([[L,0],[0,I]]) =
    [[inv(L),0],[0,I]]), then the result is cropped back.
    """
    n = L.shape[-1]
    if not block:
        block = hybrid_block(n)
    n_pad = -(-n // block) * block
    if n_pad != n:
        extra = n_pad - n
        L = jnp.pad(L, ((0, extra), (0, extra)))
        L = L + jnp.diag(
            jnp.pad(jnp.zeros((n,), L.dtype), (0, extra), constant_values=1.0)
        )
    nb = n_pad // block
    dblocks = jnp.stack(
        [L[k * block:(k + 1) * block, k * block:(k + 1) * block]
         for k in range(nb)]
    )
    eye = jnp.eye(block, dtype=L.dtype)
    Wd = jax.vmap(
        lambda Ld: jax.scipy.linalg.solve_triangular(Ld, eye, lower=True)
    )(dblocks)
    W = _tri_inv_assemble(L, [Wd[k] for k in range(nb)], block, precision)
    return W[:n, :n]


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def mvn_nll_hybrid(Sigma, y, block=0, precision="high"):
    """NLML of y ~ N(0, Sigma) — XLA cholesky + GEMM-only solves/VJP.

    The large-n SINGLE-matrix counterpart of `mvn_nll_blocked` (which is
    shaped for vmapped batches): the factorization uses XLA's pipelined
    cholesky at the exact n (fastest single-matrix route), and every
    O(n^3) term after it — inv(L), quadratic form, and the closed-form
    backward's K^{-1} — is a GEMM.  1.25-1.8x faster NLML+grad+Adam steps
    than the fused-VJP path for n in [512, 4096] on v5e (see
    `hybrid_block`).  Same value/grad contract as `linalg.mvn_nll_fused`;
    `models/cigp.py` selects it automatically at n >= 512.
    """
    val, _ = _nll_hybrid_fwd(Sigma, y, block, precision)
    return val


def _nll_hybrid_fwd(Sigma, y, block, precision):
    # y must be [n, d] (a 1-D y would make the bwd cotangent shape wrong)
    n, d = y.shape
    # exact f32 factorization + GEMM-assembled inverse at ``precision``
    L, W = chol_inv_padded(Sigma, block=512 if not block else block,
                           precision=precision, factor="xla")
    gamma = _mm(W, y, "highest")
    val = (
        0.5 * jnp.sum(gamma**2)
        + d * jnp.sum(jnp.log(jnp.diagonal(L)))
        + 0.5 * n * d * LOG2PI
    )
    return val, (W, gamma)


def _nll_hybrid_bwd(block, precision, res, g):
    W, gamma = res
    d = gamma.shape[1]
    alpha = _mm(W.T, gamma, "highest")
    # gradient-only GEMM at the fast default precision: the bf16-induced
    # ~1-2% relative gradient noise does not change training outcomes
    # (on-chip convergence check, BASELINE.md "TPU matmul precision")
    Kinv = _mm(W.T, W, "default")
    dSigma = g * 0.5 * (d * Kinv - alpha @ alpha.T)
    return dSigma, g * alpha


mvn_nll_hybrid.defvjp(_nll_hybrid_fwd, _nll_hybrid_bwd)


def auto_block(n: int) -> int:
    """Block-size policy from live v5e measurements (BASELINE.md): inside
    the real restart training loop at R=32 n=1024 the step costs 10.7 ms
    with block=128, 11.5 ms with 256, 12.5 ms with 512 (vs 15.1 ms for the
    Cholesky+solve path), so 128 is the default for large stages; below
    ~320 rows a single 64/128 panel keeps identity-padding waste small."""
    if n >= 320:
        return 128
    return 64


def mvn_nll_blocked(
    Sigma: jnp.ndarray,
    y: jnp.ndarray,
    block: int = 0,
    leaf: str = "v2",
    mask=None,
) -> jnp.ndarray:
    """NLML of y ~ N(0, Sigma), GEMM-only under vmap (see module docstring).

    Default ``leaf="v2"`` (round 5): the copy-minimized factorization
    (`blocked_chol_inv_v2`) — measured 10.88 ms vs 11.7-11.8 for the v1
    layout at the R=32 n=1024 restart step (2942 vs ~2720 agg steps/s;
    BASELINE.md "Round 5: batched-restart speed of light").

    Same value/gradient contract as `linalg.mvn_nll_fused`; pads Sigma
    with identity rows (zero targets) to a block multiple, which changes
    neither the likelihood of the valid rows nor their gradients.
    ``block=0`` selects `auto_block`.  With ``mask``, Sigma must already
    have identity rows at masked-out entries (`linalg.assemble_sigma`);
    targets are zeroed here and the 2*pi constant uses the live row count
    — exactly `linalg.mvn_nll`'s masked value.
    """
    if y.ndim == 1:
        y = y[:, None]
    n = Sigma.shape[-1]
    if not block:
        block = auto_block(n)
    mask_correction = 0.0
    if mask is not None:
        y = y * mask[:, None].astype(y.dtype)
        n_eff = jnp.sum(mask).astype(y.dtype)
        mask_correction = 0.5 * (n - n_eff) * y.shape[1] * LOG2PI
    n_pad = -(-n // block) * block
    if n_pad != n:
        extra = n_pad - n
        Sigma = jnp.pad(Sigma, ((0, extra), (0, extra)))
        Sigma = Sigma + jnp.diag(
            jnp.pad(jnp.zeros((n,), Sigma.dtype), (0, extra),
                    constant_values=1.0)
        )
        y = jnp.pad(y, ((0, extra), (0, 0)))
        correction = 0.5 * extra * y.shape[1] * LOG2PI
    else:
        correction = 0.0
    return _nll_blocked_core(Sigma, y, block, leaf) - correction - mask_correction
