"""Pallas TPU kernels for BATCHED dense GP linalg at moderate n.

Why this exists: the framework's signature single-chip parallel axis is
vmapped hyperparameter restarts (SURVEY.md §2.8/§7) — R independent
NLML-Adam chains, each factorizing an (n, n) Gram with n in the hundreds
to ~1k.  XLA's TPU Cholesky/triangular-solve near-SERIALIZE over the
batch dimension (measured on v5e: R=32 batched n=1024 Cholesky costs
26.5x a single one, i.e. batching efficiency ~1.2x), so restarts gain
almost nothing on one chip.

These kernels instead factor ONE whole matrix per grid step entirely in
VMEM (an n=1024 f32 matrix is 4 MB), with every shape static:

  * `cholesky_vmem`   — blocked right-looking Cholesky over a statically
    unrolled panel loop; the trailing submatrix shrinks with static
    slices, so there is no dynamic indexing anywhere (Mosaic implements
    neither `dynamic_slice` on values nor value-level scatter).
  * `tri_inv_vmem`    — blocked forward-substitution inverse of the
    lower-triangular factor.

Both are registered with jax's vmap batching machinery automatically
(vmapping a `pallas_call` prepends a grid dimension), so
`jax.vmap(cholesky_vmem)(K_batch)` runs one factorization per grid step
with Pallas double-buffering the HBM<->VMEM block transfers — the MXU
does panel solves and trailing updates back-to-back instead of XLA's
serialized per-element loop.

`mvn_nll_pallas` builds the fused NLML (value + closed-form custom VJP)
on top: forward = one Cholesky + one triangular INVERSE (the inverse,
unlike a solve, turns the backward pass into pure batched matmuls —
numerically fine here because cond(L) = sqrt(cond(Sigma)) and GP Grams
are jittered).  Use it under `jax.vmap` for the restart axis.

Constraints: n must be a multiple of `block` (pad with identity rows via
`ops/linalg.py` masking if needed); the whole matrix must fit VMEM
(n <= ~1024 f32 alongside temporaries).

STATUS (measured, v5e, R=32 n=1024): this kernel runs CORRECTLY on
hardware but at 19.6 ms per batched factorization vs XLA's 8.7 ms — the
per-panel dependency chain of VPU-bound 128-wide masked loops and
single-buffered grid steps dominates at these sizes, and sub-128 leaf
recursion loses more to Mosaic relayouts than it saves (see `_LEAF`).
XLA therefore remains the production path for batched factorizations;
this module is kept as a correct, tested foundation for future batched-
factorization work (profiled numbers in BASELINE.md).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from benchmarks.retired.pallas_cholesky import _chol_unblocked, _tri_inv_lower

LOG2PI = 1.8378770664093453


def _dot_nt(a, b):
    """a @ b.T without materializing a transpose (Mosaic-friendly)."""
    return jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )


def _dot_nn(a, b):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


_LEAF = 128  # masked-loop leaf size.  Measured on v5e (R=32, n=1024):
# leaf=128 (no recursion) 19.6 ms, leaf=32 23.8 ms — sub-128 lane slices
# force Mosaic relayouts that cost more than the saved VPU loop work, so
# recursion below one (128, 128) tile does not pay on this hardware.


def _chol_recursive(a):
    B = a.shape[0]
    if B <= _LEAF:
        return _chol_unblocked(a)
    h = B // 2
    L11 = _chol_recursive(a[:h, :h])
    U11 = _tri_inv_recursive(L11)
    L21 = _dot_nt(a[h:, :h], U11)
    L22 = _chol_recursive(a[h:, h:] - _dot_nt(L21, L21))
    top = jnp.concatenate([L11, jnp.zeros((h, B - h), a.dtype)], axis=1)
    bot = jnp.concatenate([L21, L22], axis=1)
    return jnp.concatenate([top, bot], axis=0)


def _tri_inv_recursive(L):
    B = L.shape[0]
    if B <= _LEAF:
        return _tri_inv_lower(L)
    h = B // 2
    X11 = _tri_inv_recursive(L[:h, :h])
    X22 = _tri_inv_recursive(L[h:, h:])
    X21 = -_dot_nn(X22, _dot_nn(L[h:, :h], X11))
    top = jnp.concatenate([X11, jnp.zeros((h, B - h), L.dtype)], axis=1)
    bot = jnp.concatenate([X21, X22], axis=1)
    return jnp.concatenate([top, bot], axis=0)


def _chol_vmem_kernel(a_ref, out_ref, *, block: int):
    """Whole-matrix blocked right-looking Cholesky, IN PLACE on out_ref.

    ``out_ref`` aliases the input buffer (input_output_aliases), so the
    factorization overwrites the matrix block-column by block-column with
    static-slice ref reads/writes — VMEM peak is one (m, block) panel plus
    the shrinking trailing value, not multiple whole-matrix temporaries
    (a second full copy overflows the 16 MB scoped limit at n=1024 once
    the vmap grid pipeline double-buffers the HBM blocks)."""
    del a_ref  # aliased with out_ref
    n = out_ref.shape[0]
    nb = n // block
    for k in range(nb):
        lo, hi = k * block, (k + 1) * block
        akk = out_ref[lo:hi, lo:hi]
        L11 = _chol_recursive(akk)  # zeroed above its diagonal
        out_ref[lo:hi, lo:hi] = L11
        if lo > 0:  # zero the strictly-upper rectangle of this block column
            out_ref[:lo, lo:hi] = jnp.zeros((lo, block), jnp.float32)
        if hi < n:
            U = _tri_inv_recursive(L11)  # L11^{-1}
            L21 = _dot_nt(out_ref[hi:, lo:hi], U)
            out_ref[hi:, lo:hi] = L21
            # trailing update in block-column strips, lower triangle only —
            # a whole-trailing-matrix value would blow the VMEM stack
            for j in range(k + 1, nb):
                jlo, jhi = j * block, (j + 1) * block
                pj = L21[jlo - hi : jhi - hi, :]
                pi = L21[jlo - hi :, :]
                out_ref[jlo:, jlo:jhi] = out_ref[jlo:, jlo:jhi] - _dot_nt(pi, pj)


def _tri_inv_vmem_kernel(l_ref, out_ref, *, block: int):
    """Whole-matrix blocked inverse of a lower-triangular factor, IN PLACE:
    X[k, :k] = -L_kk^{-1} (L[k, :k] @ X[:k, :k]),  X[k, k] = L_kk^{-1}.

    Row-block k reads L's row k (not yet overwritten) and X's already-
    inverted leading block, so aliasing input and output is safe.  The
    input's strictly-upper triangle must be zero (cholesky_vmem's output
    is); it is passed through untouched."""
    del l_ref  # aliased with out_ref
    n = out_ref.shape[0]
    nb = n // block
    for k in range(nb):
        lo, hi = k * block, (k + 1) * block
        inv_kk = _tri_inv_recursive(out_ref[lo:hi, lo:hi])
        if k > 0:
            # acc = L[k, :k] @ X[:k, :k], accumulated in (block, lo) strips
            # to keep the VMEM stack off whole-matrix temporaries
            acc = jnp.zeros((block, lo), jnp.float32)
            for j in range(k):
                jlo, jhi = j * block, (j + 1) * block
                acc = acc + _dot_nn(
                    out_ref[lo:hi, jlo:jhi], out_ref[jlo:jhi, :lo]
                )
            out_ref[lo:hi, :lo] = -_dot_nn(inv_kk, acc)
        out_ref[lo:hi, lo:hi] = inv_kk


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def cholesky_vmem(A: jnp.ndarray, block: int = 128, interpret: bool = False):
    """Lower Cholesky factor, whole matrix in VMEM.  vmap-able: the batch
    axis becomes the Pallas grid (one factorization per grid step)."""
    n = A.shape[0]
    assert n % block == 0, (n, block)
    # single-buffered: per-matrix compute (~100 us) dwarfs the 4 MB DMA
    # (~10 us), and double-buffered in+out blocks alone would exceed the
    # ~16 MB VMEM at n=1024 under a vmap grid
    return pl.pallas_call(
        functools.partial(_chol_vmem_kernel, block=block),
        out_shape=jax.ShapeDtypeStruct((n, n), jnp.float32),
        in_specs=[pl.BlockSpec(pipeline_mode=pl.Buffered(buffer_count=1))],
        out_specs=pl.BlockSpec(pipeline_mode=pl.Buffered(buffer_count=1)),
        input_output_aliases={0: 0},
        interpret=interpret,
    )(A.astype(jnp.float32))


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def tri_inv_vmem(L: jnp.ndarray, block: int = 128, interpret: bool = False):
    """Inverse of a lower-triangular matrix, whole matrix in VMEM."""
    n = L.shape[0]
    assert n % block == 0, (n, block)
    return pl.pallas_call(
        functools.partial(_tri_inv_vmem_kernel, block=block),
        out_shape=jax.ShapeDtypeStruct((n, n), jnp.float32),
        in_specs=[pl.BlockSpec(pipeline_mode=pl.Buffered(buffer_count=1))],
        out_specs=pl.BlockSpec(pipeline_mode=pl.Buffered(buffer_count=1)),
        input_output_aliases={0: 0},
        interpret=interpret,
    )(L.astype(jnp.float32))


# ------------------------------------------------------------ fused NLML
@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def mvn_nll_pallas(Sigma: jnp.ndarray, y: jnp.ndarray, interpret: bool = False):
    """NLML of y ~ N(0, Sigma) (columns summed) on the batched Pallas path.

    Same value/gradient contract as `ops/linalg.py:mvn_nll_fused`, but the
    factorization and ALL backward linear algebra are batch-parallel:
    designed for `jax.vmap` over the restart axis, where XLA's
    cholesky/solve batching rules serialize.
    """
    val, _ = _mvn_nll_pallas_fwd(Sigma, y, interpret)
    return val


def _mvn_nll_pallas_fwd(Sigma, y, interpret):
    L = cholesky_vmem(Sigma, interpret=interpret)
    Linv = tri_inv_vmem(L, interpret=interpret)
    gamma = Linv @ y
    n, d = y.shape
    val = (
        0.5 * jnp.sum(gamma**2)
        + d * jnp.sum(jnp.log(jnp.diagonal(L)))
        + 0.5 * n * d * LOG2PI
    )
    return val, (Linv, gamma)


def _mvn_nll_pallas_bwd(interpret, res, g):
    Linv, gamma = res
    d = gamma.shape[1]
    alpha = Linv.T @ gamma  # Sigma^{-1} y
    Kinv = Linv.T @ Linv
    dSigma = g * 0.5 * (d * Kinv - alpha @ alpha.T)
    return dSigma, g * alpha


mvn_nll_pallas.defvjp(_mvn_nll_pallas_fwd, _mvn_nll_pallas_bwd)
