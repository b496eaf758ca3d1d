"""In-scan timing of TPU eigh building blocks (chain-difference).

Measures, at several sizes: XLA's native Jacobi custom call, the QDWH
divide-and-conquer at various termination sizes, and plain GEMMs at
HIGHEST precision (the currency a warm-started spectral tracker would
pay in).  See scripts/measure_eigh.py for why.

Run: python scripts/measure_eigh2.py <stage> with stage in
  jacobi256 jacobi512 term128 term512 gemm1024 default1024
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


def gram(n):
    rng = np.random.default_rng(0)
    x = (rng.random((n, 1)) * 10).astype(np.float32)
    d2 = (x - x.T) ** 2
    return np.exp(-0.5 * d2).astype(np.float32) + 1e-3 * np.eye(n, dtype=np.float32)


def main():
    import jax
    import jax.numpy as jnp
    from jax.lax import linalg as lax_linalg
    from jax._src.tpu.linalg import eigh as tpu_eigh

    stages = sys.argv[1:] or ["jacobi256"]
    print("devices:", jax.devices(), "stages:", stages, flush=True)

    def run(name, n, body):
        K = gram(n)

        def mk(L):
            def step(c, _):
                M = K + c * jnp.eye(n, dtype=jnp.float32)
                return c + 1e-12, body(M)

            def fn():
                _, vals = jax.lax.scan(step, jnp.float32(0), None, length=L)
                return jnp.sum(vals) * 1e-6

            return jax.jit(fn)

        med, lo, hi = chain(mk)
        print(f"{name:28s} {med*1e3:8.2f} ms [{lo*1e3:.2f}, {hi*1e3:.2f}]",
              flush=True)

    def jacobi_body(M):
        V, w = lax_linalg.eigh(
            M, symmetrize_input=False,
            implementation=lax_linalg.EighImplementation.JACOBI,
        )
        return jnp.sum(w) + jnp.sum(V[0])

    def term_body(ts):
        def body(M):
            w, V = tpu_eigh.eigh(M, termination_size=ts)
            return jnp.sum(w) + jnp.sum(V[0])
        return body

    for s in stages:
        if s == "jacobi256":
            run("jacobi n=256", 256, jacobi_body)
        elif s == "jacobi512":
            run("jacobi n=512", 512, jacobi_body)
        elif s == "jacobi128":
            run("jacobi n=128", 128, jacobi_body)
        elif s == "term128":
            run("qdwh term=128 n=1024", 1024, term_body(128))
        elif s == "term512":
            run("qdwh term=512 n=1024", 1024, term_body(512))
        elif s == "default1024":
            run("qdwh term=256 n=1024", 1024, term_body(256))
        elif s == "gemm1024":
            def gemm_body(M):
                P = jax.lax.Precision.HIGHEST
                B = jnp.dot(M, M, precision=P)
                return B[0, 0]
            run("gemm n=1024 HIGHEST", 1024, gemm_body)
        else:
            print("unknown stage", s)


if __name__ == "__main__":
    main()
