"""Benchmark harness: NLML-training throughput + dense-linalg speed of light.

Prints ONE JSON line to stdout:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline: NLML+grad+Adam training steps/s at n=1024 f32 — the hot loop of
every model in the framework (ARD Gram -> jittered Cholesky -> triangular
solve -> logdet -> reverse-mode grad -> Adam), fully jit-scanned.
``vs_baseline`` compares against the reference PyTorch-CPU implementation
measured on the same problem (re-run of `GaussianProcess/cigp_v10.py`'s
train loop; recorded fallback if the reference tree is unavailable).

Timing methodology: each kernel is timed as the DIFFERENCE between a long
and a short `lax.scan` chain inside one jitted call with a scalar output —
this cancels dispatch/transfer overhead, which dominates naive per-call
timing on the tunneled TPU (a naive measurement here is ~50x pessimistic).
All sub-benchmarks go to stderr; only the headline JSON goes to stdout.
"""

import json
import sys
import time

import numpy as np

# Reference torch-CPU step rates measured on this host (2 vCPU), see
# BASELINE.md for the measurement protocol:
REF_STEPS_PER_S = {300: 257.2, 1024: 16.1}


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def measure_reference(n: int) -> float:
    try:
        sys.path.insert(0, "/root/reference")
        import torch
        import GaussianProcess.kernel as rkernel
        from GaussianProcess.cigp_v10 import cigp

        torch.manual_seed(0)
        x = torch.rand(n, 1) * 20
        y = torch.sin(x)
        model = cigp(kernel=rkernel.SquaredExponentialKernel(), log_beta=1.0)
        opt = torch.optim.Adam(model.parameters(), lr=1e-2)
        for _ in range(3):
            opt.zero_grad()
            loss = -model.negative_log_likelihood(x, y)
            loss.backward()
            opt.step()
        iters = 30
        t0 = time.time()
        for _ in range(iters):
            opt.zero_grad()
            loss = -model.negative_log_likelihood(x, y)
            loss.backward()
            opt.step()
        return iters / (time.time() - t0)
    except Exception as e:
        log(f"[ref] falling back to recorded baseline ({e})")
        return REF_STEPS_PER_S.get(n, REF_STEPS_PER_S[1024])


def chain_time(jitted_fns, args, reps=3):
    """(t_long - t_short) / (L_long - L_short) per-op seconds.

    All arrays must be passed as ARGUMENTS (not closed over): closing over
    device arrays makes jit lowering fetch them as MLIR constants, which
    can deadlock over the tunneled-TPU transport.
    """
    (f_short, L_short), (f_long, L_long) = jitted_fns
    float(f_short(*args))
    float(f_long(*args))

    def t(f):
        t0 = time.time()
        for _ in range(reps):
            float(f(*args))
        return (time.time() - t0) / reps

    return (t(f_long) - t(f_short)) / (L_long - L_short)


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from fidelityfusion_tpu.models.cigp import CIGP
    from fidelityfusion_tpu.ops.kernels import ARDKernel, SquaredExponentialKernel

    log(f"[env] backend={jax.default_backend()} devices={jax.devices()}")
    rng = np.random.default_rng(0)
    results = {}

    # ---------- NLML+grad+Adam steps/s, n in {300, 1024, 4096}
    def nlml_chain(gp, L):
        opt = optax.adam(1e-2)

        def fn(p0, x, y):
            def body(carry, _):
                p, s = carry
                loss, g = jax.value_and_grad(lambda pp: gp.nll(pp, x, y))(p)
                u, s = opt.update(g, s, p)
                return (optax.apply_updates(p, u), s), loss

            (_, _), losses = jax.lax.scan(
                body, (p0, opt.init(p0)), None, length=L
            )
            return jnp.sum(losses) * 1e-6

        return jax.jit(fn)

    for n in (300, 1024, 4096):
        x = jnp.asarray(rng.random((n, 1)) * 20, jnp.float32)
        y = jnp.sin(x)
        gp = CIGP(kernel=SquaredExponentialKernel())
        p0 = gp.init_params(1)
        L1, L2 = (5, 55) if n >= 4096 else (10, 110)
        per = chain_time(
            [(nlml_chain(gp, L1), L1), (nlml_chain(gp, L2), L2)],
            (p0, x, y),
        )
        results[f"nlml_steps_per_s_n{n}"] = 1.0 / per
        log(f"[bench] NLML+grad+Adam n={n}: {per*1e3:.3f} ms/step -> {1/per:.0f} steps/s")

    # ---------- vmapped restarts: aggregate steps/s at R=32, n=1024
    n, R = 1024, 32
    x = jnp.asarray(rng.random((n, 1)) * 20, jnp.float32)
    y = jnp.sin(x)
    gp = CIGP(kernel=SquaredExponentialKernel())
    p0 = gp.init_params(1)

    def restart_chain(L):
        opt = optax.adam(1e-2)

        def fn(batch, x, y):
            def single(p_init):
                def body(carry, _):
                    p, s = carry
                    loss, g = jax.value_and_grad(lambda pp: gp.nll(pp, x, y))(p)
                    u, s = opt.update(g, s, p)
                    return (optax.apply_updates(p, u), s), loss

                (_, _), losses = jax.lax.scan(
                    body, (p_init, opt.init(p_init)), None, length=L
                )
                return jnp.sum(losses)

            return jnp.sum(jax.vmap(single)(batch)) * 1e-6

        return jax.jit(fn)

    batch = jax.tree_util.tree_map(
        lambda a: jnp.stack([a + 0.01 * i for i in range(R)]), p0
    )
    per = chain_time([(restart_chain(5), 5), (restart_chain(30), 30)], (batch, x, y))
    results["restart_agg_steps_per_s_R32_n1024"] = R / per
    log(
        f"[bench] vmapped restarts R={R} n={n}: {per*1e3:.3f} ms/step-row -> "
        f"{R/per:.0f} aggregate steps/s"
    )

    # ---------- Cholesky TFLOP/s at n=4096 f32
    nc = 4096
    A = rng.random((nc, 64)).astype(np.float32)
    K = jnp.asarray(A @ A.T + nc * np.eye(nc, dtype=np.float32))

    def chol_chain(L):
        def fn(M):
            def body(c, _):
                Lc = jnp.linalg.cholesky(M + (c * 1e-9) * jnp.eye(nc))
                return jnp.sum(Lc) * 1e-9, ()

            out, _ = jax.lax.scan(body, 0.0, None, length=L)
            return out

        return jax.jit(fn)

    per = chain_time([(chol_chain(2), 2), (chol_chain(12), 12)], (K,))
    results["cholesky_tflops_n4096"] = (nc**3 / 3.0) / per / 1e12
    log(
        f"[bench] Cholesky n=4096: {per*1e3:.2f} ms -> "
        f"{results['cholesky_tflops_n4096']:.1f} TFLOP/s"
    )

    # ---------- ARD Gram build at n=4096, d=8
    xg = jnp.asarray(rng.random((4096, 8)), jnp.float32)
    ard = ARDKernel()
    ap = ard.init_params(8)

    def gram_chain(L):
        def fn(p, a):
            def body(c, _):
                G = ard.apply(p, a + c * 1e-12, a)
                return jnp.sum(G) * 1e-12, ()

            out, _ = jax.lax.scan(body, 0.0, None, length=L)
            return out

        return jax.jit(fn)

    per = chain_time([(gram_chain(2), 2), (gram_chain(12), 12)], (ap, xg))
    results["gram_ms_n4096"] = per * 1e3
    log(f"[bench] ARD Gram n=4096 d=8: {per*1e3:.3f} ms")

    # ---------- headline
    headline = results["nlml_steps_per_s_n1024"]
    ref = measure_reference(1024)
    log(f"[ref] torch-CPU n=1024: {ref:.1f} steps/s")
    print(
        json.dumps(
            {
                "metric": "nlml_grad_adam_steps_per_s_n1024",
                "value": round(float(headline), 1),
                "unit": "steps/s",
                "vs_baseline": round(float(headline) / ref, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
