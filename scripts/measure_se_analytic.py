"""On-chip: analytic-gradient SE NLML step vs hybrid, n in {1024, 2048, 4096}.

Also decomposes the se_nlml step (fwd-only vs fwd+bwd) and sweeps the
tri_inv block inside it.  Tunnel-safe: host numpy inputs, watchdog,
chain-difference timing, single process.
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

from fidelityfusion_tpu.ops import linalg
from fidelityfusion_tpu.ops.blocked import mvn_nll_hybrid
from fidelityfusion_tpu.ops.fused_se import se_nlml
from fidelityfusion_tpu.ops.kernels import SquaredExponentialKernel


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


def p0_host():
    return {
        "kernel": {"length_scale": np.ones(1, np.float32),
                   "signal_variance": np.ones(1, np.float32)},
        "log_beta": np.ones(1, np.float32),
    }


def step_time(nll, n, L1, L2):
    rng = np.random.default_rng(0)
    x = (rng.random((n, 1)) * 20).astype(np.float32)
    y = np.sin(x)
    p0 = p0_host()
    opt = optax.adam(1e-2)

    def mk(L):
        def fn():
            def body(carry, _):
                p, s = carry
                loss, g = jax.value_and_grad(
                    lambda pp: nll(pp, jnp.asarray(x), jnp.asarray(y)))(p)
                u, s = opt.update(g, s, p)
                return (optax.apply_updates(p, u), s), loss

            (_, _), losses = jax.lax.scan(
                body, (p0, opt.init(p0)), None, length=L)
            return jnp.sum(losses) * 1e-6

        return jax.jit(fn)

    return chain_time(mk, L1, L2)


def main():
    kern = SquaredExponentialKernel()

    def nll_hybrid(p, x, y):
        K = kern.apply(p["kernel"], x, x)
        Sigma = linalg.assemble_sigma(K, jnp.exp(-p["log_beta"][0]))
        return mvn_nll_hybrid(Sigma, y)  # block=0 -> hybrid_block policy

    def nll_se(p, x, y):
        return se_nlml(p, x, y, 1e-6)

    for n, L1, L2 in ((1024, 5, 35), (2048, 3, 18), (4096, 2, 10)):
        t_h = step_time(nll_hybrid, n, L1, L2)
        print(f"RESULT hybrid n={n}: {t_h*1e3:.3f} ms ({1/t_h:.0f} steps/s)",
              flush=True)
        t_s = step_time(nll_se, n, L1, L2)
        print(f"RESULT se_analytic n={n}: {t_s*1e3:.3f} ms "
              f"({1/t_s:.0f} steps/s)", flush=True)

    # forward-only se_nlml at n=4096 (isolates the backward's extra GEMM)
    n = 4096
    rng = np.random.default_rng(0)
    x = (rng.random((n, 1)) * 20).astype(np.float32)
    y = np.sin(x)
    p0 = p0_host()

    def mk(L):
        def fn():
            def body(c, _):
                v = se_nlml(
                    {"kernel": {
                        "length_scale": p0["kernel"]["length_scale"] + c * 1e-12,
                        "signal_variance": p0["kernel"]["signal_variance"]},
                     "log_beta": p0["log_beta"]},
                    jnp.asarray(x), jnp.asarray(y), 1e-6)
                return v * 1e-6, ()

            out, _ = jax.lax.scan(body, 0.0, None, length=L)
            return out

        return jax.jit(fn)

    t_f = chain_time(mk, 2, 10)
    print(f"RESULT se_fwd_only n=4096: {t_f*1e3:.3f} ms", flush=True)


if __name__ == "__main__":
    print("devices:", jax.devices(), file=sys.stderr, flush=True)
    main()
