"""Pallas TPU kernel: blocked right-looking Cholesky factorization.

The O(n^3) Cholesky is THE hot op of the framework (every NLML/posterior
evaluation, SURVEY.md §2 "Hot math").  XLA's built-in TPU Cholesky runs
the panel algorithm with small internal blocks (~10 TFLOP/s at n=4096
measured on v5e); this kernel restructures the factorization so ~all
FLOPs land in MXU matmuls:

    for k in panels:                       (sequential grid dimension)
        L11 = chol(A[k,k])                 in-VMEM unblocked loop
        U   = inv(L11)                     in-VMEM triangular inversion
        L21 = A[k+1:, k] @ U^T             one MXU matmul (panel in VMEM)
        A[k+1:, k+1:] -= L21 @ L21^T       MXU, streamed block-by-block

Layout: the full matrix stays in HBM (`pl.ANY`); each sequential grid
step DMAs its (n x B) panel into VMEM scratch (4 MB at n=4096, B=256),
factors it, writes it back, and streams the trailing update through a
second VMEM scratch.  Step 0 first copies A into the output buffer and
all subsequent traffic goes through that working buffer (cross-step
input/output aliasing is interpreter-unsafe).

The small in-VMEM loops (diag factor + triangular inverse) are O(B^3)
VPU work per panel — amortized to O(n B^2) total, negligible against the
O(n^3/3) MXU work for n >> B.

`cholesky_blocked(..., interpret=True)` runs under the Pallas interpreter
for CPU testing; `ops/linalg.py` keeps the XLA path as default until the
Pallas path wins the benchmark on the target chip (see bench.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _chol_unblocked(a):
    """Unblocked lower Cholesky of a (B, B) VMEM-resident block via a
    column loop of vectorized rank-1 updates.

    No dynamic indexing anywhere: Pallas TPU lowering does not implement
    `dynamic_slice`/`dynamic_update_slice` on *values* (only ref loads and
    stores take dynamic offsets), so row/column extraction and writes use
    iota masks + reductions instead — O(B^2) VPU work per column either way.
    """
    B = a.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (B, B), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (B, B), 1)
    idx = jax.lax.broadcasted_iota(jnp.int32, (B,), 0)

    def body(c, L):
        colmask = cols == c
        pivot2 = jnp.sum(jnp.where(colmask & (rows == c), L, 0.0))
        pivot = jnp.sqrt(jnp.maximum(pivot2, 1e-20))
        col = jnp.sum(jnp.where(colmask, L, 0.0), axis=1) / pivot
        col = jnp.where(idx >= c, col, 0.0)
        # trailing update: L[:, c+1:] -= col * col[c+1:]^T restricted
        upd = col[:, None] * col[None, :]
        mask = (cols > c) & (rows >= cols)
        L = jnp.where(mask, L - upd, L)
        L = jnp.where(colmask, col[:, None], L)
        return L

    L = jax.lax.fori_loop(0, B, body, a)
    return jnp.where(rows >= cols, L, 0.0)


def _tri_inv_lower(L):
    """Inverse of a lower-triangular (B, B) block by forward substitution,
    one row of the solution at a time: solve L X = I.  Mask-indexed for the
    same Pallas-TPU reason as `_chol_unblocked`."""
    B = L.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (B, B), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (B, B), 1)
    idx = jax.lax.broadcasted_iota(jnp.int32, (B,), 0)

    def body(c, X):
        rowmask = rows == c
        # X[c, :] = (I[c, :] - L[c, :c] @ X[:c, :]) / L[c, c]
        lrow = jnp.sum(jnp.where(rowmask, L, 0.0), axis=0)
        diag = jnp.sum(jnp.where(rowmask & (cols == c), L, 0.0))
        lrow = jnp.where(idx < c, lrow, 0.0)
        # keep the dot 2-D: Mosaic's dot attr encoding rejects rank-1 lhs
        acc = (lrow[None, :] @ X)[0]  # (B,)
        eye_row = (idx == c).astype(L.dtype)
        X = jnp.where(rowmask, ((eye_row - acc) / diag)[None, :], X)
        return X

    return jax.lax.fori_loop(0, B, body, jnp.zeros_like(L))


def _chol_kernel(a_hbm, out_hbm, *, block: int, nb: int):
    """Sequential-grid kernel body: program k factors panel k."""
    k = pl.program_id(0)
    n = nb * block

    def scoped(panel, tile, sem_p, sem_t):
        # ---- step 0 copies A into the output buffer; all later reads and
        # writes go through out_hbm only (input/output aliasing across
        # sequential grid steps is not guaranteed by the interpreter).
        @pl.when(k == 0)
        def _():
            def copy_col(j, _):
                cc = pltpu.make_async_copy(
                    a_hbm.at[:, pl.ds(j * block, block)], panel, sem_p
                )
                cc.start()
                cc.wait()
                wb0 = pltpu.make_async_copy(
                    panel, out_hbm.at[:, pl.ds(j * block, block)], sem_p
                )
                wb0.start()
                wb0.wait()
                return ()

            jax.lax.fori_loop(0, nb, copy_col, ())

        # ---- load the full (n, B) panel column k from the working buffer
        cp = pltpu.make_async_copy(
            out_hbm.at[:, pl.ds(k * block, block)], panel, sem_p
        )
        cp.start()
        cp.wait()

        # ---- factor diagonal block + invert
        diag = panel[pl.ds(k * block, block), :]
        L11 = _chol_unblocked(diag)
        U = _tri_inv_lower(L11)  # L11^{-1}

        # ---- panel solve: rows below the diagonal become A21 @ U^T;
        # rows above stay (they belong to already-factored columns).
        rows = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
        below = (rows >= (k + 1) * block).astype(panel.dtype)
        solved = jax.lax.dot_general(
            panel[:], U, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        new_panel = solved * below + panel[:] * (1.0 - below)
        panel[:] = new_panel
        # dynamic-offset ref STORE (supported on TPU, unlike value-level
        # dynamic_update_slice) places the factored diagonal block
        panel[pl.ds(k * block, block), :] = L11

        # ---- write the panel back
        wb = pltpu.make_async_copy(
            panel, out_hbm.at[:, pl.ds(k * block, block)], sem_p
        )
        wb.start()
        wb.wait()

        # ---- trailing update: for block pairs (i, j), i,j > k:
        # A[i, j] -= P_i @ P_j^T   (P = solved panel rows)
        def update_pair(idx, _):
            # enumerate (i, j) with k < j <= i < nb
            i = idx // nb
            j = idx % nb

            @pl.when((i > k) & (j > k) & (j <= i))
            def _():
                load = pltpu.make_async_copy(
                    out_hbm.at[pl.ds(i * block, block), pl.ds(j * block, block)],
                    tile,
                    sem_t,
                )
                load.start()
                load.wait()
                pi = panel[pl.ds(i * block, block), :]
                pj = panel[pl.ds(j * block, block), :]
                upd = jax.lax.dot_general(
                    pi, pj, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                tile[:] = tile[:] - upd
                store = pltpu.make_async_copy(
                    tile,
                    out_hbm.at[pl.ds(i * block, block), pl.ds(j * block, block)],
                    sem_t,
                )
                store.start()
                store.wait()

            return ()

        jax.lax.fori_loop(0, nb * nb, update_pair, ())

    pl.run_scoped(
        scoped,
        panel=pltpu.VMEM((n, block), jnp.float32),
        tile=pltpu.VMEM((block, block), jnp.float32),
        sem_p=pltpu.SemaphoreType.DMA(()),
        sem_t=pltpu.SemaphoreType.DMA(()),
    )


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def cholesky_blocked(
    A: jnp.ndarray, block: int = 256, interpret: bool = False
) -> jnp.ndarray:
    """Lower Cholesky factor of an SPD matrix with n % block == 0.

    In-place over an aliased HBM buffer; the sequential grid dimension
    carries the panel ordering.  Returns the lower-triangular factor
    (upper triangle zeroed).
    """
    n = A.shape[0]
    assert n % block == 0, (n, block)
    nb = n // block
    kernel = functools.partial(_chol_kernel, block=block, nb=nb)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, n), jnp.float32),
        grid=(nb,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(A.astype(jnp.float32))
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    return jnp.where(rows >= cols, out, 0.0)
