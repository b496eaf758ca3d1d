"""Quick one-shot timing of TPU eigh variants (see measure_eigh.py)."""
import os
import sys
import time

import numpy as np

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from jax.lax import linalg as lax_linalg

    print("devices:", jax.devices(), flush=True)
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    rng = np.random.default_rng(0)
    x = (rng.random((n, 1)) * 10).astype(np.float32)
    d2 = (x - x.T) ** 2
    K = np.exp(-0.5 * d2).astype(np.float32) + 1e-3 * np.eye(n, dtype=np.float32)
    Kd = jnp.asarray(K)

    @jax.jit
    def jacobi(M):
        V, w = lax_linalg.eigh(
            M, symmetrize_input=False,
            implementation=lax_linalg.EighImplementation.JACOBI,
        )
        return jnp.sum(w) + jnp.sum(V[0])

    @jax.jit
    def qdwh(M):
        w, V = jnp.linalg.eigh(M)
        return jnp.sum(w) + jnp.sum(V[0])

    for name, fn in [("jacobi", jacobi), ("qdwh", qdwh)]:
        t0 = time.time()
        float(fn(Kd))
        print(f"{name} compile+first: {time.time()-t0:.2f}s", flush=True)
        times = []
        for _ in range(7):
            t0 = time.time()
            float(fn(Kd))
            times.append(time.time() - t0)
        times.sort()
        print(f"{name} n={n}: median {times[3]*1e3:.2f} ms "
              f"[{times[0]*1e3:.2f}, {times[-1]*1e3:.2f}]", flush=True)

    @jax.jit
    def acc(M):
        w1, V1 = jnp.linalg.eigh(M)
        V2, w2 = lax_linalg.eigh(
            M, symmetrize_input=False,
            implementation=lax_linalg.EighImplementation.JACOBI,
        )
        I = jnp.eye(n, dtype=M.dtype)
        r1 = jnp.max(jnp.abs(M @ V1 - V1 * w1[None, :]))
        r2 = jnp.max(jnp.abs(M @ V2 - V2 * w2[None, :]))
        o1 = jnp.max(jnp.abs(V1.T @ V1 - I))
        o2 = jnp.max(jnp.abs(V2.T @ V2 - I))
        return r1, o1, r2, o2, jnp.max(jnp.abs(jnp.sort(w1) - jnp.sort(w2)))

    r1, o1, r2, o2, dw = [float(v) for v in acc(Kd)]
    print(f"residual/orth qdwh {r1:.2e}/{o1:.2e} jacobi {r2:.2e}/{o2:.2e} "
          f"max|dw| {dw:.2e}", flush=True)


if __name__ == "__main__":
    main()
