"""Batched-restart speed-of-light derivation (VERDICT r4 weak #3).

The single-stream n=4096 step has a measured-primitive bound and a "91%
of bound" claim; the R=32 n=1024 vmapped restart step (10.7 ms shipping,
~2750-2990 agg steps/s) has none — this script derives it with the same
methodology and adjudicates the suspected ~3x.

Stages (all chain-difference timed, median-of-reps):
  full        the shipping restart step (vmapped blocked NLML + grad +
              Adam, models/ar.py:_blocked_variant configuration)
  gram        batched SE Gram build + noise assembly only
  fwd         batched blocked_chol_inv forward only (L, W)
  valgrad     batched NLML value+grad (no Adam)
  gemm_d      batched (32,1024,1024) GEMM at DEFAULT -> TFLOP/s
  gemm_h      same at HIGH
  leaf        batched (256,128,128) XLA cholesky (the leaves)
  opt_fwd     the round-5 OPTIMIZED factorization (shrinking trailing
              blocks + single final assembly — no full-matrix .at[] copies)
  opt_full    full step through the optimized path

FLOP model per restart (n=1024, b=128, d=1, F := 2 n^3 = 2.15e9):
  Schur updates        ~ F/3       (HIGH)
  panel solves         ~ 0.12e9    (HIGH)
  inv(L) D&C assembly  ~ F/3       (HIGH)
  backward K^-1 = W^TW ~ F         (DEFAULT)
  leaves               8 x chol(128) (batched, tiny)
  elementwise          ~6 full-matrix HBM passes (Gram exp, diag adds,
                       dSigma combine, kernel VJP)

bound = leaves + HIGH-flops/rate(HIGH) + DEFAULT-flops/rate(DEFAULT)
        + HBM passes / measured bandwidth + Adam

Run on the TPU (default env).  Results recorded in BASELINE.md
"Round 5: batched-restart speed of light".
"""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from fidelityfusion_tpu.models.cigp import CIGP
    from fidelityfusion_tpu.ops.blocked import (
        blocked_chol_inv,
        mvn_nll_blocked,
    )
    from fidelityfusion_tpu.ops.kernels import SquaredExponentialKernel

    R, n, d_in = 32, 1024, 1
    rng = np.random.default_rng(0)
    x = (rng.random((n, d_in)) * 20).astype(np.float32)
    y = np.sin(x).astype(np.float32)
    gp = CIGP(kernel=SquaredExponentialKernel(), blocked_nll=True,
              se_analytic_nll=False, hybrid_nll=False)
    p0 = gp.init_params(d_in)
    batch = jax.tree_util.tree_map(
        lambda a: jnp.stack([a * (1.0 + 0.01 * i) for i in range(R)]), p0
    )
    xj, yj = jnp.asarray(x), jnp.asarray(y)

    def chain(make_fn, L1, L2, reps=5):
        f1, f2 = make_fn(L1), make_fn(L2)
        float(f1()); float(f2())

        def once(f):
            t0 = time.time(); float(f()); return time.time() - t0

        diffs = sorted((once(f2) - once(f1)) / (L2 - L1)
                       for _ in range(reps))
        lo, hi = diffs[0], diffs[-1]
        return diffs[len(diffs) // 2], lo, hi

    def scan_of(body):
        def mk(L):
            def fn():
                def step(c, _):
                    c2, out = body(c)
                    return c2, out
                _, outs = jax.lax.scan(step, init_carry(), None, length=L)
                return jnp.sum(outs) * 1e-6
            return jax.jit(fn)
        return mk

    # ---- full shipping step ------------------------------------------
    opt = optax.adam(1e-2)

    def init_carry():
        return (batch, jax.vmap(lambda p: opt.init(p))(batch))

    def full_body(c):
        pb, sb = c

        def one(p, s):
            loss, g = jax.value_and_grad(
                lambda pp: gp.nll(pp, xj, yj))(p)
            u, s = opt.update(g, s, p)
            return optax.apply_updates(p, u), s, loss

        pb, sb, losses = jax.vmap(one)(pb, sb)
        return (pb, sb), jnp.sum(losses)

    med, lo, hi = chain(scan_of(full_body), 6, 30)
    print(f"full: {med*1e3:.2f} ms [{lo*1e3:.2f},{hi*1e3:.2f}] "
          f"-> {R/med:.0f} agg steps/s", flush=True)

    # ---- batched Gram only -------------------------------------------
    def gram_body(c):
        pb, sb = c

        def one(p):
            K = gp.kernel.apply(p["kernel"], xj, xj)
            return jnp.sum(K)

        return (pb, sb), jnp.sum(jax.vmap(one)(pb))

    med_g, lo, hi = chain(scan_of(gram_body), 6, 30)
    print(f"gram: {med_g*1e3:.3f} ms [{lo*1e3:.3f},{hi*1e3:.3f}]")

    # ---- batched factorization fwd only ------------------------------
    from fidelityfusion_tpu.ops import linalg

    def sigma_of(p):
        K = gp.kernel.apply(p["kernel"], xj, xj)
        return linalg.assemble_sigma(
            K, gp.noise(p, jnp.mean(jnp.diagonal(K))), jitter=gp.jitter
        )

    def fwd_body(c):
        pb, sb = c

        def one(p):
            L, W = blocked_chol_inv(sigma_of(p), block=128, leaf="xla")
            return jnp.sum(jnp.diagonal(L)) + W[0, 0]

        return (pb, sb), jnp.sum(jax.vmap(one)(pb))

    med_f, lo, hi = chain(scan_of(fwd_body), 6, 30)
    print(f"fwd(L,W incl gram): {med_f*1e3:.2f} ms [{lo*1e3:.2f},{hi*1e3:.2f}]")

    # ---- batched val+grad (no Adam) ----------------------------------
    def vg_body(c):
        pb, sb = c

        def one(p):
            loss, g = jax.value_and_grad(lambda pp: gp.nll(pp, xj, yj))(p)
            return loss + jax.tree_util.tree_reduce(
                lambda a, b: a + jnp.sum(b), g, 0.0
            )

        return (pb, sb), jnp.sum(jax.vmap(one)(pb))

    med_vg, lo, hi = chain(scan_of(vg_body), 6, 30)
    print(f"val+grad: {med_vg*1e3:.2f} ms [{lo*1e3:.2f},{hi*1e3:.2f}]")

    # ---- batched GEMM rates ------------------------------------------
    A = jnp.asarray(rng.standard_normal((R, n, n)).astype(np.float32))
    B = jnp.asarray(rng.standard_normal((R, n, n)).astype(np.float32))

    for name, prec in (("default", jax.lax.Precision.DEFAULT),
                       ("high", jax.lax.Precision.HIGH)):
        def mk(L, prec=prec):
            # big operands must be jit ARGUMENTS (closure constants
            # overflow the tunnel's remote-compile request at 128 MB),
            # and the product must FEED THE CARRY: with only
            # out[:, 0, 0] consumed, XLA narrows the matmul to a
            # single column (first attempt read an impossible
            # 1980 TFLOP/s)
            @jax.jit
            def run(a, b):
                def step(c, _):
                    ca, cb = c
                    out = jnp.matmul(ca, cb, precision=prec)
                    return (ca, cb + 1e-3 * out), jnp.sum(out[:, 0, 0])
                _, outs = jax.lax.scan(step, (a, b), None, length=L)
                return jnp.sum(outs) * 1e-6
            return lambda: run(A, B)

        med_m, lo, hi = chain(mk, 4, 16)
        tf = R * 2 * n**3 / med_m / 1e12
        print(f"gemm_{name}: {med_m*1e3:.3f} ms -> {tf:.1f} TFLOP/s",
              flush=True)

    # ---- batched leaf cholesky ---------------------------------------
    Dl = jnp.asarray(
        rng.standard_normal((R * 8, 128, 128)).astype(np.float32))
    Dl = jnp.matmul(Dl, jnp.swapaxes(Dl, -1, -2)) + 128 * jnp.eye(128)

    def mk_leaf_shape(Dmat):
        def mk(L):
            @jax.jit
            def run(d):
                def step(c, _):
                    Lc = jnp.linalg.cholesky(c)
                    # feed the factor back (SPD reconstruction) so the
                    # scan body can neither DCE nor hoist the cholesky
                    return jnp.matmul(Lc, jnp.swapaxes(Lc, -1, -2)), \
                        jnp.sum(Lc[:, 0, 0])
                _, outs = jax.lax.scan(step, d, None, length=L)
                return jnp.sum(outs) * 1e-6
            return lambda: run(Dmat)
        return mk

    med_l, lo, hi = chain(mk_leaf_shape(Dl), 6, 30)
    print(f"leaf chol (256,128,128): {med_l*1e3:.3f} ms "
          f"[{lo*1e3:.3f},{hi*1e3:.3f}]", flush=True)
    med_l32, lo, hi = chain(mk_leaf_shape(Dl[:32]), 6, 30)
    print(f"leaf chol (32,128,128): {med_l32*1e3:.3f} ms "
          f"[{lo*1e3:.3f},{hi*1e3:.3f}] (x8 sequential = "
          f"{8*med_l32*1e3:.2f} ms in the production factorization)",
          flush=True)

    # fused-leaf batched rank-1 sweep at the same shape
    from fidelityfusion_tpu.ops.blocked import _leaf_chol_inv

    def mk_fused(L):
        @jax.jit
        def run(d):
            def step(c, _):
                Lc, Wc = jax.vmap(_leaf_chol_inv)(c)
                return jnp.matmul(Lc, jnp.swapaxes(Lc, -1, -2)), \
                    jnp.sum(Lc[:, 0, 0]) + jnp.sum(Wc[:, 0, 0])
            _, outs = jax.lax.scan(step, d, None, length=L)
            return jnp.sum(outs) * 1e-6
        return lambda: run(Dl[:32])

    med_fl, lo, hi = chain(mk_fused, 6, 30)
    print(f"fused leaf (32,128,128) incl inv: {med_fl*1e3:.3f} ms "
          f"[{lo*1e3:.3f},{hi*1e3:.3f}] (x8 = {8*med_fl*1e3:.2f} ms)",
          flush=True)

    # ---- optimized factorization (round 5) ---------------------------
    from fidelityfusion_tpu.ops.blocked import blocked_chol_inv_v2

    def ofwd_body(c):
        pb, sb = c

        def one(p):
            L, W = blocked_chol_inv_v2(sigma_of(p), block=128)
            return jnp.sum(jnp.diagonal(L)) + W[0, 0]

        return (pb, sb), jnp.sum(jax.vmap(one)(pb))

    med_of, lo, hi = chain(scan_of(ofwd_body), 6, 30)
    print(f"opt fwd(L,W incl gram): {med_of*1e3:.2f} ms "
          f"[{lo*1e3:.2f},{hi*1e3:.2f}]")

    gp_v2 = CIGP(kernel=SquaredExponentialKernel(), blocked_nll=True,
                 se_analytic_nll=False, hybrid_nll=False)

    def ofull_body(c):
        pb, sb = c

        def one(p, s):
            def loss_fn(pp):
                Sigma = linalg.assemble_sigma(
                    gp_v2.kernel.apply(pp["kernel"], xj, xj),
                    gp_v2.noise(pp, 1.0), jitter=gp_v2.jitter,
                )
                return mvn_nll_blocked(Sigma, yj, block=128, leaf="v2")

            loss, g = jax.value_and_grad(loss_fn)(p)
            u, s = opt.update(g, s, p)
            return optax.apply_updates(p, u), s, loss

        pb, sb, losses = jax.vmap(one)(pb, sb)
        return (pb, sb), jnp.sum(losses)

    med_o, lo, hi = chain(scan_of(ofull_body), 6, 30)
    print(f"opt full: {med_o*1e3:.2f} ms [{lo*1e3:.2f},{hi*1e3:.2f}] "
          f"-> {R/med_o:.0f} agg steps/s", flush=True)

    # v2 with the FUSED leaf (batched rank-1 sweeps instead of XLA's
    # serializing batched small cholesky) at two block sizes
    for blk in (128, 256):
        def off_body(c, blk=blk):
            pb, sb = c

            def one(p, s):
                def loss_fn(pp):
                    Sigma = linalg.assemble_sigma(
                        gp_v2.kernel.apply(pp["kernel"], xj, xj),
                        gp_v2.noise(pp, 1.0), jitter=gp_v2.jitter,
                    )
                    return mvn_nll_blocked(Sigma, yj, block=blk,
                                           leaf="v2f")

                loss, g = jax.value_and_grad(loss_fn)(p)
                u, s = opt.update(g, s, p)
                return optax.apply_updates(p, u), s, loss

            pb, sb, losses = jax.vmap(one)(pb, sb)
            return (pb, sb), jnp.sum(losses)

        med_vf, lo, hi = chain(scan_of(off_body), 6, 30)
        print(f"opt full v2f block={blk}: {med_vf*1e3:.2f} ms "
              f"[{lo*1e3:.2f},{hi*1e3:.2f}] -> {R/med_vf:.0f} agg steps/s",
              flush=True)


if __name__ == "__main__":
    main()
