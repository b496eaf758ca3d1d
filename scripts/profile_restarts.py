"""On-chip decomposition of the vmapped-restart NLML step (R=32, n=1024).

Times each piece of the blocked GEMM-only path (`ops/blocked.py`) with the
same chain-difference methodology as bench.py, to locate where the 10.7 ms
full-step cost (BASELINE.md) goes.  Run directly on the real TPU.

Measured 2026-08-18 (v5e):
  blocked_chol_inv fwd (leaf=xla)    8.78 ms   <-- dominates the 10.7 ms step
  blocked_chol_inv fwd (leaf=fused) 14.68 ms
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import faulthandler

faulthandler.dump_traceback_later(900, exit=True)

import numpy as np
import jax
import jax.numpy as jnp

from fidelityfusion_tpu.ops import blocked

R, n = 32, 1024
BLOCK = 128
rng = np.random.default_rng(0)

a = rng.random((R, n, 64)).astype(np.float32)
Sig = np.einsum("rij,rkj->rik", a, a) + n * np.eye(n, dtype=np.float32)
Y = np.tile(np.sin(rng.random((n, 1)).astype(np.float32)), (R, 1, 1))


def chain_time(make_fn, L1, L2, reps=3):
    f1, f2 = make_fn(L1), make_fn(L2)
    float(f1())
    float(f2())

    def t(f):
        t0 = time.time()
        for _ in range(reps):
            float(f())
        return (time.time() - t0) / reps

    return (t(f2) - t(f1)) / (L2 - L1)


def scan_over(body_of_c):
    def mk(L):
        def fn():
            def body(c, _):
                return body_of_c(c), ()

            out, _ = jax.lax.scan(body, 0.0, None, length=L)
            return out

        return jax.jit(fn)

    return mk


def report(name, per_ms):
    print(f"{name:46s} {per_ms*1e3:8.3f} ms", flush=True)


eye_b = np.eye(BLOCK, dtype=np.float32)


# --- A. leaf chain only: 8 sequential batched 128 chol (+triinv), serialized
def leaf_chain(c, with_inv=True):
    out = 0.0
    D = Sig[:, :BLOCK, :BLOCK] + c * 1e-12
    for k in range(n // BLOCK):
        Ld = jnp.linalg.cholesky(D)
        if with_inv:
            Wd = jax.vmap(
                lambda l: jax.scipy.linalg.solve_triangular(l, eye_b, lower=True)
            )(Ld)
            out = out + jnp.sum(Wd[:, 0, 0]) * 1e-9
            D = D + Wd[:, :1, :1] * 1e-12
        else:
            out = out + jnp.sum(Ld[:, 0, 0]) * 1e-9
            D = D + Ld[:, :1, :1] * 1e-12
    return out


report("8x batched chol(128) only", chain_time(scan_over(lambda c: leaf_chain(c, False)), 3, 18))
report("8x batched chol(128)+triinv(solve)", chain_time(scan_over(lambda c: leaf_chain(c, True)), 3, 18))


# --- B. GEMM skeleton: blocked_chol_inv with leaf replaced by a no-op
def skeleton(S):
    Lm = jnp.zeros_like(S)
    A_work = S
    diag_invs = []
    for k in range(n // BLOCK):
        s0 = k * BLOCK
        e0 = s0 + BLOCK
        D = A_work[s0:e0, s0:e0]
        Ld = jnp.tril(D)  # dummy leaf
        Wd = D * 0.5      # dummy inverse
        diag_invs.append(Wd)
        Lm = Lm.at[s0:e0, s0:e0].set(Ld)
        if e0 < n:
            L21 = A_work[e0:, s0:e0] @ Wd.T
            Lm = Lm.at[e0:, s0:e0].set(L21)
            A_work = A_work.at[e0:, e0:].add(-(L21 @ L21.T))
    W = blocked._tri_inv_assemble(Lm, diag_invs, BLOCK)
    return jnp.sum(W[0, 0]) * 1e-9 + jnp.sum(Lm[0, 0]) * 1e-12


report(
    "GEMM skeleton (panels+Schur+assemble)",
    chain_time(scan_over(lambda c: jnp.sum(jax.vmap(skeleton)(Sig + c * 1e-12)) * 1e-6), 3, 18),
)


# --- C. assemble only
Lfix, dinv_fix = None, None


def assemble_only(S):
    Lm = jnp.tril(S)
    diag_invs = [S[k * BLOCK:(k + 1) * BLOCK, k * BLOCK:(k + 1) * BLOCK] for k in range(n // BLOCK)]
    W = blocked._tri_inv_assemble(Lm, diag_invs, BLOCK)
    return jnp.sum(W[0, 0]) * 1e-9


report(
    "tri_inv_assemble only",
    chain_time(scan_over(lambda c: jnp.sum(jax.vmap(assemble_only)(Sig + c * 1e-12)) * 1e-6), 3, 18),
)


# --- D. single batched chol(1024) for comparison (XLA full)
def xla_chol(c):
    Lc = jnp.linalg.cholesky(Sig + c * 1e-12)
    return jnp.sum(Lc[:, 0, 0]) * 1e-9


report("XLA batched chol(1024)", chain_time(scan_over(xla_chol), 3, 18))


# --- E. batched big GEMM roofline probe
M = rng.random((R, n, n)).astype(np.float32)


def gemm_body(c):
    out = jnp.einsum("rij,rjk->rik", M + c * 1e-12, M)
    return jnp.sum(out[:, 0, 0]) * 1e-9


report("1x batched GEMM (R,1024,1024)^2", chain_time(scan_over(gemm_body), 3, 18))

print("done", flush=True)
