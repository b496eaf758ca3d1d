"""One-off on-chip experiment: hybrid GEMM-only NLML vs the fused-VJP path.

Hypothesis (BASELINE.md): at n=4096 the fused NLML+grad step (11.5 ms) is
bound by triangular solves (~13 TFLOP/s on v5e); replacing them with
W=inv(L) built from XLA's cholesky + batched diag-block inverses + D&C
GEMM assembly (`ops/blocked.py`, leaf="hybrid") should cut the step to
~5 ms.  Run directly on the TPU (no JAX_PLATFORMS override); follows
bench.py's tunnel-safety rules: host-side numpy inputs, faulthandler
watchdog, chain-difference timing.
"""

import os
import sys
import time

# repo root importable WITHOUT PYTHONPATH: setting PYTHONPATH=/root/repo
# breaks the axon TPU plugin's backend registration in this image, so the
# script appends the path itself (append, not prepend, for the same reason)
sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import faulthandler

faulthandler.dump_traceback_later(480, exit=True)

import numpy as np
import jax
import jax.numpy as jnp
import optax

from fidelityfusion_tpu.models.cigp import CIGP
from fidelityfusion_tpu.ops.kernels import SquaredExponentialKernel


def se_params():
    return {
        "kernel": {
            "length_scale": np.ones(1, np.float32),
            "signal_variance": np.ones(1, np.float32),
        },
        "log_beta": np.ones(1, np.float32),
    }


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


def step_time(gp, n, L1, L2):
    """Fused-VJP baseline, pinned to linalg.mvn_nll_fused directly (NOT
    gp.nll, whose size-based dispatch now routes n>=512 to the hybrid path
    — going through it would make both experiment arms measure hybrid)."""
    from fidelityfusion_tpu.ops import linalg

    rng = np.random.default_rng(0)
    x = (rng.random((n, 1)) * 20).astype(np.float32)
    y = np.sin(x)
    p0 = se_params()
    opt = optax.adam(1e-2)
    kern = gp.kernel

    def nll(p):
        K = kern.apply(p["kernel"], jnp.asarray(x), jnp.asarray(x))
        Sigma = linalg.assemble_sigma(K, jnp.exp(-p["log_beta"][0]))
        return linalg.mvn_nll_fused(Sigma, jnp.asarray(y))

    def mk(L):
        def fn():
            def body(carry, _):
                p, s = carry
                loss, g = jax.value_and_grad(nll)(p)
                u, s = opt.update(g, s, p)
                return (optax.apply_updates(p, u), s), loss

            (_, _), losses = jax.lax.scan(
                body, (p0, opt.init(p0)), None, length=L
            )
            return jnp.sum(losses) * 1e-6

        return jax.jit(fn)

    return chain_time(mk, L1, L2)


def main():
    print("devices:", jax.devices(), file=sys.stderr, flush=True)
    base = CIGP(kernel=SquaredExponentialKernel())
    for n, L1, L2 in ((1024, 5, 35), (4096, 2, 10)):
        t_fused = step_time(base, n, L1, L2)
        print(f"RESULT fused n={n}: {t_fused*1e3:.3f} ms/step", flush=True)
        for block in (256, 512):
            try:
                t_h = step_time_hybrid(base, n, L1, L2, block)
                print(f"RESULT hybrid n={n} block={block}: {t_h*1e3:.3f} ms/step",
                      flush=True)
            except Exception as e:
                print(f"FAIL hybrid n={n} block={block}: {e!r}", flush=True)


def step_time_hybrid(gp, n, L1, L2, block):
    """Same loop but calling mvn_nll_blocked(leaf='hybrid') directly."""
    from fidelityfusion_tpu.ops.blocked import mvn_nll_blocked
    from fidelityfusion_tpu.ops import linalg

    rng = np.random.default_rng(0)
    x = (rng.random((n, 1)) * 20).astype(np.float32)
    y = np.sin(x)
    p0 = se_params()
    opt = optax.adam(1e-2)
    kern = gp.kernel

    def nll(p):
        K = kern.apply(p["kernel"], jnp.asarray(x), jnp.asarray(x))
        Sigma = linalg.assemble_sigma(K, jnp.exp(-p["log_beta"][0]))
        return mvn_nll_blocked(Sigma, jnp.asarray(y), block=block,
                               leaf="hybrid")

    def mk(L):
        def fn():
            def body(carry, _):
                p, s = carry
                loss, g = jax.value_and_grad(nll)(p)
                u, s = opt.update(g, s, p)
                return (optax.apply_updates(p, u), s), loss

            (_, _), losses = jax.lax.scan(
                body, (p0, opt.init(p0)), None, length=L
            )
            return jnp.sum(losses) * 1e-6

        return jax.jit(fn)

    return chain_time(mk, L1, L2)


if __name__ == "__main__":
    main()
