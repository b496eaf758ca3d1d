"""On-chip decomposition of the n=4096 NLML+grad step + precision rooflines.

Measures (chain-difference timing, one process, tunnel-safe):
  1. matmul n=4096 f32 at precision DEFAULT / HIGH / HIGHEST  -> the honest
     GEMM rooflines (DEFAULT on TPU is bf16-1pass; HIGH bf16x3; HIGHEST
     bf16x6 / f32-exact)
  2. XLA cholesky n=4096
  3. tri_inv_gemm(L) (blocked inverse assembly) at blocks 256/512/1024
  4. W^T W (the K^{-1} materialization)
  5. batched diag-block trsm (the leaf step)
  6. the full hybrid NLML+grad+Adam step at blocks 256/512/1024 (current
     default = hybrid_block(4096) = 512)
  7. Pallas fused ARD Gram block sweep (VERDICT item 6)
  8. eigh + modedot (Kronecker-path primitives, for BASELINE)

Prints RESULT lines; run under the default env (real TPU).
"""

import os
import sys
import time

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import faulthandler

faulthandler.dump_traceback_later(560, exit=True)

import numpy as np
import jax
import jax.numpy as jnp
import optax


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


def scan_time(body_of_c, L1=2, L2=12):
    """Time one iteration of body(c) -> scalar via chain difference."""
    def mk(L):
        def fn():
            def body(c, _):
                return body_of_c(c), ()

            out, _ = jax.lax.scan(body, 0.0, None, length=L)
            return out

        return jax.jit(fn)

    return chain_time(mk, L1, L2)


def main():
    n = 4096
    rng = np.random.default_rng(0)
    A = rng.random((n, 64)).astype(np.float32)
    K = A @ A.T + n * np.eye(n, dtype=np.float32)
    B = rng.random((n, n)).astype(np.float32)
    Lc_host = np.linalg.cholesky(K).astype(np.float32)

    # 1. matmul precision ladder
    for prec in ("default", "high", "highest"):
        p = {"default": jax.lax.Precision.DEFAULT,
             "high": jax.lax.Precision.HIGH,
             "highest": jax.lax.Precision.HIGHEST}[prec]

        def body(c, _p=p):
            M = jnp.dot(B + c * 1e-12, B, precision=_p)
            return jnp.sum(M) * 1e-12

        per = scan_time(body)
        tf = 2 * n**3 / per / 1e12
        print(f"RESULT matmul4096_{prec}: {per*1e3:.3f} ms = {tf:.1f} TFLOP/s",
              flush=True)

    # 2. XLA cholesky
    per = scan_time(lambda c: jnp.sum(
        jnp.linalg.cholesky(K + (c * 1e-9) * jnp.eye(n))) * 1e-9)
    print(f"RESULT chol4096: {per*1e3:.3f} ms "
          f"({n**3/3/per/1e12:.1f} TFLOP/s @ n^3/3)", flush=True)

    # 3. tri_inv_gemm blocks
    from fidelityfusion_tpu.ops.blocked import tri_inv_gemm

    for blk in (256, 512, 1024):
        per = scan_time(lambda c, b=blk: jnp.sum(
            tri_inv_gemm(jnp.asarray(Lc_host) + c * 1e-12, block=b)) * 1e-12,
            L1=2, L2=8)
        print(f"RESULT tri_inv_b{blk}: {per*1e3:.3f} ms", flush=True)

    # 4. W^T W
    per = scan_time(lambda c: jnp.sum(
        (Lc_host + c * 1e-12).T @ jnp.asarray(Lc_host)) * 1e-12)
    print(f"RESULT wTw: {per*1e3:.3f} ms", flush=True)

    # 5. batched diag-block trsm (8 x 512)
    dblocks = np.stack([Lc_host[k*512:(k+1)*512, k*512:(k+1)*512]
                        for k in range(8)])
    eye512 = np.eye(512, dtype=np.float32)

    def btrsm(c):
        W = jax.vmap(lambda Ld: jax.scipy.linalg.solve_triangular(
            Ld + c * 1e-12, eye512, lower=True))(jnp.asarray(dblocks))
        return jnp.sum(W) * 1e-12

    per = scan_time(btrsm)
    print(f"RESULT batched_trsm_8x512: {per*1e3:.3f} ms", flush=True)

    # 6. full hybrid step at several blocks
    from fidelityfusion_tpu.models.cigp import CIGP
    from fidelityfusion_tpu.ops import linalg
    from fidelityfusion_tpu.ops.blocked import mvn_nll_hybrid
    from fidelityfusion_tpu.ops.kernels import SquaredExponentialKernel

    x = (rng.random((n, 1)) * 20).astype(np.float32)
    y = np.sin(x)
    kern = SquaredExponentialKernel()
    p0 = {
        "kernel": {"length_scale": np.ones(1, np.float32),
                   "signal_variance": np.ones(1, np.float32)},
        "log_beta": np.ones(1, np.float32),
    }
    opt = optax.adam(1e-2)

    def step_time(blk):
        def nll(p):
            Km = kern.apply(p["kernel"], jnp.asarray(x), jnp.asarray(x))
            Sigma = linalg.assemble_sigma(Km, jnp.exp(-p["log_beta"][0]))
            return mvn_nll_hybrid(Sigma, jnp.asarray(y), blk)

        def mk(L):
            def fn():
                def body(carry, _):
                    p, s = carry
                    loss, g = jax.value_and_grad(nll)(p)
                    u, s = opt.update(g, s, p)
                    return (optax.apply_updates(p, u), s), loss

                (_, _), losses = jax.lax.scan(
                    body, (p0, opt.init(p0)), None, length=L)
                return jnp.sum(losses) * 1e-6

            return jax.jit(fn)

        return chain_time(mk, 2, 10)

    for blk in (256, 512, 1024):
        per = step_time(blk)
        print(f"RESULT hybrid_step_b{blk}: {per*1e3:.3f} ms "
              f"({1/per:.0f} steps/s)", flush=True)

    # 7. pallas gram block sweep
    try:
        from benchmarks.retired.pallas_gram import gram_sigma_ard

        xg = rng.random((4096, 8)).astype(np.float32)
        ap = {"length_scales": np.ones(8, np.float32),
              "signal_variance": np.ones(1, np.float32)}

        per = scan_time(lambda c: jnp.sum(
            gram_sigma_ard(ap, xg + c * 1e-12, 0.1)) * 1e-12)
        print(f"RESULT pallas_gram4096: {per*1e3:.3f} ms", flush=True)

        from fidelityfusion_tpu.ops.kernels import ARDKernel
        ard = ARDKernel()
        per = scan_time(lambda c: jnp.sum(
            ard.apply(ap, xg + c * 1e-12, xg)) * 1e-12)
        print(f"RESULT xla_gram4096: {per*1e3:.3f} ms", flush=True)
    except Exception as e:
        print(f"FAIL pallas_gram: {e!r}", flush=True)

    # 8. Kronecker primitives
    per = scan_time(lambda c: jnp.sum(jnp.linalg.eigh(
        jnp.asarray(K[:1024, :1024]) + c * 1e-9)[0]) * 1e-9, L1=1, L2=5)
    print(f"RESULT eigh1024: {per*1e3:.3f} ms", flush=True)


if __name__ == "__main__":
    print("devices:", jax.devices(), file=sys.stderr, flush=True)
    main()
