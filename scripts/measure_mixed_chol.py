"""On-chip experiment (VERDICT r2 item 2): mixed-precision blocked
factorization vs the shipping XLA-cholesky path at n=4096.

The shipping fused-SE NLML (`ops/fused_se.py:se_nlml`) factors Sigma with
XLA's f32 cholesky (2.32 ms) and GEMM-assembles W = inv(L) at HIGH
(bf16x3).  The one-pass blocked factorization (`ops/blocked.py:
blocked_chol_inv`, leaf="xla") produces BOTH L and W in one sweep and
measured 1.48 ms at the bf16 MXU default — but bf16 Schur updates NaN
real SE Grams (round-2 precision finding).  The untried middle ground is
the bf16x3 ("high") Schur: 3 bf16 passes recover ~f32 accuracy at ~2.5x
bf16 cost (the "split-matrix bf16x2/x3 Schur with f32 correction" idea
named in BASELINE.md:150-152).

This script measures, on the real chip:
  1. accuracy of (L, W) from blocked/high vs blocked/highest vs the
     shipping xla+high on two fixtures — the bench Gram (benign) and an
     ill-conditioned clustered-x Gram with the relative noise floor (the
     fixture class that NaN'd at bf16);
     metrics: ||W Sigma W^T - I||_inf (whitening error — the quantity the
     NLML actually consumes), NLML value vs the xla/HIGHEST reference,
     max relative se_nlml gradient difference;
  2. end-to-end se_nlml+Adam step time at n=4096 for factor=xla (ship)
     vs factor=blocked at high/highest, chain-difference timed.

Follows bench.py tunnel-safety rules: host-side numpy inputs, watchdog,
no concurrent TPU process.
"""

import os
import sys
import time

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import faulthandler

faulthandler.dump_traceback_later(600, exit=True)

import numpy as np
import jax
import jax.numpy as jnp
import optax

from fidelityfusion_tpu.ops import fused_se
from fidelityfusion_tpu.ops.blocked import blocked_chol_inv, chol_inv_padded
from fidelityfusion_tpu.ops.fused_se import se_nlml


def se_params(ls=1.0, sv=1.0, lb=1.0):
    return {
        "kernel": {
            "length_scale": np.full(1, ls, np.float32),
            "signal_variance": np.full(1, sv, np.float32),
        },
        "log_beta": np.full(1, lb, np.float32),
    }


def chain_time(make_fn, L1, L2, reps=5):
    f1, f2 = make_fn(L1), make_fn(L2)
    float(f1())
    float(f2())

    def once(f):
        t0 = time.time()
        float(f())
        return time.time() - t0

    diffs = sorted((once(f2) - once(f1)) / (L2 - L1) for _ in range(reps))
    return diffs[len(diffs) // 2], diffs[0], diffs[-1]


def fixtures(n=4096):
    rng = np.random.default_rng(0)
    # benign: bench Gram, x ~ U[0, 20], noise e^{-1}
    x_b = (rng.random((n, 1)) * 20).astype(np.float32)
    p_b = se_params()
    # ill-conditioned: clustered x (range ~ length scale), noise at the
    # relative f32 floor 1e-4 * e^{2u} — the class that NaN'd at bf16
    x_i = np.sort(rng.random((n, 1)).astype(np.float32) * 2.0, axis=0)
    p_i = se_params(ls=1.0, sv=0.5, lb=12.0)  # e^{-12} << floor -> clamped
    return [("benign", x_b, p_b), ("illcond", x_i, p_i)]


def build_sigma(params, x, min_noise=1e-4):
    K, c, Sigma = fused_se._se_sigma_parts(
        jax.tree_util.tree_map(jnp.asarray, params), jnp.asarray(x), 1e-6,
        min_noise)
    return Sigma


def whitening_err(W, Sigma):
    n = Sigma.shape[0]
    M = jnp.matmul(
        jnp.matmul(W, Sigma, precision=jax.lax.Precision.HIGHEST),
        W.T, precision=jax.lax.Precision.HIGHEST)
    return float(jnp.max(jnp.abs(M - jnp.eye(n))))


def main():
    n = 4096
    y = np.sin(np.linspace(0, 20, n)).astype(np.float32).reshape(n, 1)

    print("== accuracy ==", flush=True)
    for name, x, p in fixtures(n):
        Sigma = build_sigma(p, x)
        variants = {
            "ship(xla,high)": lambda S: chol_inv_padded(
                S, precision="high", factor="xla"),
            "blocked,high": lambda S: blocked_chol_inv(
                S, block=512, leaf="xla", precision="high"),
            "blocked,highest": lambda S: blocked_chol_inv(
                S, block=512, leaf="xla", precision="highest"),
        }
        # reference NLML value/grad: shipping path at HIGHEST assembly
        ref_v, ref_g = jax.value_and_grad(
            lambda pp: se_nlml(pp, jnp.asarray(x), jnp.asarray(y), 1e-6,
                               "highest", "xla", "highest", 1e-4)
        )(jax.tree_util.tree_map(jnp.asarray, p))
        ref_g_flat = np.concatenate(
            [np.asarray(l).ravel() for l in jax.tree_util.tree_leaves(ref_g)])
        for vname, fn in variants.items():
            L, W = jax.jit(fn)(Sigma)
            werr = whitening_err(W, Sigma)
            ld = float(jnp.sum(jnp.log(jnp.diagonal(L))))
            print(f"  {name:8s} {vname:18s} whiten_err {werr:.3e} "
                  f"logdet {ld:.6f}", flush=True)
        for prec in ("high", "highest"):
            v, g = jax.value_and_grad(
                lambda pp: se_nlml(pp, jnp.asarray(x), jnp.asarray(y), 1e-6,
                                   prec, "blocked", None, 1e-4)
            )(jax.tree_util.tree_map(jnp.asarray, p))
            g_flat = np.concatenate(
                [np.asarray(l).ravel()
                 for l in jax.tree_util.tree_leaves(g)])
            rel_v = abs(float(v) - float(ref_v)) / abs(float(ref_v))
            rel_g = float(np.max(np.abs(g_flat - ref_g_flat)
                                 / (np.abs(ref_g_flat) + 1e-8)))
            print(f"  {name:8s} se_nlml blocked/{prec}: |dV|/V {rel_v:.3e} "
                  f"max|dg|/g {rel_g:.3e}", flush=True)

    print("== timing (se_nlml+grad+Adam step, n=4096) ==", flush=True)
    rng = np.random.default_rng(0)
    x = (rng.random((n, 1)) * 20).astype(np.float32)
    yb = np.sin(x)
    p0 = se_params()
    opt = optax.adam(1e-2)

    def mk(factor, precision):
        def make(Lc):
            def fn():
                def body(carry, _):
                    pp, s = carry
                    loss, g = jax.value_and_grad(
                        lambda q: se_nlml(q, x, yb, 1e-6, precision, factor,
                                          None, 1e-4))(pp)
                    u, s = opt.update(g, s, pp)
                    return (optax.apply_updates(pp, u), s), loss

                (_, _), losses = jax.lax.scan(
                    body, (p0, opt.init(p0)), None, length=Lc)
                return jnp.sum(losses) * 1e-6

            return jax.jit(fn)
        return make

    for factor, precision in (("xla", "high"), ("blocked", "high"),
                              ("blocked", "highest")):
        med, lo, hi = chain_time(mk(factor, precision), 3, 23)
        print(f"  {factor}/{precision}: {med*1e3:.2f} ms/step "
              f"[{lo*1e3:.2f}, {hi*1e3:.2f}] -> {1/med:.1f} steps/s",
              flush=True)

    # isolated factorization timing
    Sigma_np = None
    Sigma = build_sigma(p0, x)
    Sigma_np = np.asarray(Sigma)

    def mk_fact(factor, precision):
        def make(Lc):
            def fn():
                def body(c, _):
                    S = jnp.asarray(Sigma_np) + (c * 1e-9) * jnp.eye(n)
                    if factor == "xla":
                        L, W = chol_inv_padded(S, precision=precision,
                                               factor="xla")
                    else:
                        L, W = blocked_chol_inv(S, block=512, leaf="xla",
                                                precision=precision)
                    return jnp.sum(L) * 1e-9 + jnp.sum(W) * 1e-12, ()

                out, _ = jax.lax.scan(body, 0.0, None, length=Lc)
                return out

            return jax.jit(fn)
        return make

    for factor, precision in (("xla", "high"), ("blocked", "high"),
                              ("blocked", "highest")):
        med, lo, hi = chain_time(mk_fact(factor, precision), 2, 12)
        print(f"  (L,W) only {factor}/{precision}: {med*1e3:.2f} ms "
              f"[{lo*1e3:.2f}, {hi*1e3:.2f}]", flush=True)


if __name__ == "__main__":
    main()
