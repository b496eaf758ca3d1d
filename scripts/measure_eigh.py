"""Measure TPU eigh variants at n=1024 on a realistic SE Gram.

The hogp1024 profile (scripts/profile_hogp.py) shows the FULL 51 ms step
is ~48 ms of eigh(1024): jnp.linalg.eigh on TPU lowers to a QDWH-based
spectral divide-and-conquer whose work loop pops one subproblem at a
time (jax/_src/tpu/linalg/eigh.py:_eigh_work) — 3 serial QDWH splits +
4 serial Jacobi leaves at n=1024.  XLA:TPU also ships a native
one-shot Jacobi eigensolver (custom call "Eigh"), which the wrapper only
uses for blocks <= 256; `lax.linalg.eigh(..., implementation=JACOBI)`
calls it directly at any size.  This script times both (vectors USED, so
XLA cannot DCE the eigenvector accumulation) and checks accuracy
(residual ||K V - V diag(w)||, orthogonality ||V^T V - I||).

Run: python scripts/measure_eigh.py [n ...]
"""
import os
import sys
import time

import numpy as np

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def chain(make_fn, L1=2, L2=8, reps=3):
    f1, f2 = make_fn(L1), make_fn(L2)
    float(f1()); float(f2())

    def once(f):
        t0 = time.time()
        float(f())
        return time.time() - t0

    diffs = sorted((once(f2) - once(f1)) / (L2 - L1) for _ in range(reps))
    return diffs[len(diffs) // 2], diffs[0], diffs[-1]


def main():
    import jax
    import jax.numpy as jnp
    from jax.lax import linalg as lax_linalg

    print("devices:", jax.devices(), flush=True)
    ns = [int(a) for a in sys.argv[1:]] or [1024]

    for n in ns:
        rng = np.random.default_rng(0)
        x = (rng.random((n, 1)) * 10).astype(np.float32)
        d2 = (x - x.T) ** 2
        K = np.exp(-0.5 * d2).astype(np.float32) + 1e-3 * np.eye(n, dtype=np.float32)

        impls = {
            "qdwh-d&c (default)": None,
            "jacobi (one-shot)": lax_linalg.EighImplementation.JACOBI,
        }
        for name, impl in impls.items():
            def mk(L, impl=impl):
                def step(c, _):
                    # c perturbs K so each iteration is fresh work
                    M = K + c * jnp.eye(n, dtype=jnp.float32)
                    if impl is None:
                        w, V = jnp.linalg.eigh(M)
                    else:
                        V, w = lax_linalg.eigh(
                            M, symmetrize_input=False, implementation=impl
                        )
                    return c + 1e-12, jnp.sum(w) + jnp.sum(V[0])

                def fn():
                    _, vals = jax.lax.scan(step, jnp.float32(0), None, length=L)
                    return jnp.sum(vals) * 1e-6

                return jax.jit(fn)

            med, lo, hi = chain(mk)
            print(f"n={n} {name:22s} {med*1e3:8.2f} ms [{lo*1e3:.2f}, {hi*1e3:.2f}]",
                  flush=True)

        # accuracy check on-chip
        @jax.jit
        def both(M):
            w1, V1 = jnp.linalg.eigh(M)
            V2, w2 = lax_linalg.eigh(
                M, symmetrize_input=False,
                implementation=lax_linalg.EighImplementation.JACOBI,
            )
            I = jnp.eye(n, dtype=M.dtype)
            def res(w, V):
                r = jnp.max(jnp.abs(M @ V - V * w[None, :]))
                o = jnp.max(jnp.abs(V.T @ V - I))
                return r, o
            return res(w1, V1), res(w2, V2), jnp.max(jnp.abs(jnp.sort(w1) - jnp.sort(w2)))

        (r1, o1), (r2, o2), dw = both(jnp.asarray(K))
        print(f"n={n} residual/orth  qdwh: {float(r1):.2e}/{float(o1):.2e}  "
              f"jacobi: {float(r2):.2e}/{float(o2):.2e}  max|dw|={float(dw):.2e}",
              flush=True)


if __name__ == "__main__":
    main()
