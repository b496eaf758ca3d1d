"""On-chip component profile of the HOGP n=1024 (32,32,32) training step.

The hogp1024 bench stage runs at ~17.8 steps/s (56 ms/step) and round-2
VERDICT flagged it as the large-n bound of the GAR/Kronecker path
(reference hot path: `GaussianProcess/hogp_simple.py:73-113`).  The
round-3 custom VJP (`ops/kron.py:kron_nlml`) fixed the f32 gradient
corruption but not the speed — this script breaks the step into its
primitives with chain-difference timing to find where the 56 ms lives.

Run on the real TPU: python scripts/profile_hogp.py
"""
import os
import sys
import time

import numpy as np

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def chain(make_fn, L1, L2, reps=3):
    import jax

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
    import optax

    from fidelityfusion_tpu.models.hogp import HOGP
    from fidelityfusion_tpu.ops.kernels import SquaredExponentialKernel
    from fidelityfusion_tpu.ops import kron

    print("devices:", jax.devices())
    n, shape = 1024, (32, 32, 32)
    rng = np.random.default_rng(0)
    x = (rng.random((n, 1)) * 10).astype(np.float32)
    y = rng.standard_normal((n,) + shape).astype(np.float32)
    hogp = HOGP(kernel=SquaredExponentialKernel(), output_shape=shape)
    p0 = hogp.init_params(1)
    opt = optax.adam(1e-2)

    def scan_of(step):
        def mk(L):
            def fn():
                def body(carry, _):
                    out = step(carry)
                    return out[0], out[1]

                (_, _), vals = jax.lax.scan(
                    body, (p0, opt.init(p0)), None, length=L
                )
                return jnp.sum(vals) * 1e-6

            return jax.jit(fn)

        return mk

    only = set(sys.argv[1:])

    def timed(name, step, L1=2, L2=8, tag=None):
        if only and tag not in only:
            return None
        med, lo, hi = chain(scan_of(step), L1, L2)
        print(f"{name:42s} {med*1e3:8.2f} ms  [{lo*1e3:.2f}, {hi*1e3:.2f}]",
              flush=True)
        return med

    # --- full step (what the bench measures)
    def full_step(carry):
        p, s = carry
        loss, g = jax.value_and_grad(lambda pp: hogp.nll(pp, x, y))(p)
        u, s = opt.update(g, s, p)
        return (optax.apply_updates(p, u), s), loss

    timed("full step (nll val+grad+adam)", full_step, tag="full")

    # --- forward only
    def fwd_only(carry):
        p, s = carry
        loss = hogp.nll(p, x, y)
        return (p, s), loss

    timed("forward nll only", fwd_only, tag="fwd")

    # --- grams + eigh only
    def grams_eigh(carry):
        p, s = carry
        K0, K_modes = hogp._grams(p, x)
        acc = 0.0
        for K in [K0] + K_modes:
            lam, V = jnp.linalg.eigh(K)
            acc = acc + jnp.sum(lam) + V[0, 0]
        return (p, s), acc

    timed("grams + eigh (all modes)", grams_eigh, tag="eigh")

    # --- eigh(1024) alone
    K0c = np.asarray(
        jax.jit(lambda: hogp._grams(p0, x)[0].astype(jnp.float32))()
    )

    def eigh_only(carry):
        p, s = carry
        lam, V = jnp.linalg.eigh(K0c + p["noise_variance"][0] * 0)
        return (p, s), jnp.sum(lam) + V[0, 0]

    timed("eigh(1024) alone", eigh_only, tag="eigh1024")

    # --- forward internals given eigs: A + T1 + quad + logdet
    def fwd_body(carry):
        p, s = carry
        K0, K_modes = hogp._grams(p, x)
        eigvals, eigvecs, A, T1 = kron._kron_nlml_eigs(
            tuple([K0] + K_modes), y, hogp.noise(p)
        )
        quad = jnp.sum(T1**2 / A)
        loss = jnp.sum(jnp.log(A)) + quad
        return (p, s), loss

    timed("fwd: grams+eigh+A+T1+quad", fwd_body, tag="fwdbody")

    # --- T1 rotation chain alone (4 mode dots on 134 MB)
    def t1_only(carry):
        p, s = carry
        V = jnp.linalg.eigh(K0c)[1] + p["noise_variance"][0] * 0
        small = [jnp.eye(d, dtype=jnp.float32) for d in shape]
        T1 = kron.multi_mode_dot(y, [V.T] + [m.T for m in small])
        return (p, s), jnp.sum(T1) * 1e-6

    timed("eigh + T1 rotation chain", t1_only, tag="t1")

    # --- backward alone: vjp of kron_nlml w.r.t. Ks given precomputed grams
    def bwd_step(carry):
        p, s = carry
        K0, K_modes = hogp._grams(p, x)
        Ks = tuple([K0] + K_modes)
        loss, vjp = jax.vjp(
            lambda ks: kron.kron_nlml(ks, y, hogp.noise(p)), Ks
        )
        (dKs,) = vjp(jnp.ones_like(loss))
        return (p, s), loss + dKs[0][0, 0]

    timed("fwd + custom bwd (vjp of kron_nlml)", bwd_step, tag="bwd")

    # --- tracked-spectrum full step (ops/spectral.py warm-start path)
    if not only or "tracked" in only:
        import optax as _optax
        from fidelityfusion_tpu.train.fit import adam_scan_aux

        def run_tracked(L, refresh):
            def loss_t(pp, aux, t):
                return hogp.nll_tracked(
                    pp, aux, t, x, y, refresh_every=refresh
                )

            def fn():
                _, _, losses, _ = adam_scan_aux(
                    loss_t, p0, hogp.tracking_aux0(n), opt, L
                )
                return jnp.sum(losses) * 1e-6

            return jax.jit(fn)

        for refresh, L1, L2, label in (
            (64, 2, 8, "tracked step only (refresh outside window)"),
            (16, 2, 34, "tracked amortized (refresh_every=16)"),
        ):
            med, lo, hi = chain(lambda L, r=refresh: run_tracked(L, r), L1, L2)
            print(f"{label:42s} {med*1e3:8.2f} ms  [{lo*1e3:.2f}, {hi*1e3:.2f}]",
                  flush=True)

    # --- on-chip parity: tracked vs exact training at full scale
    if not only or "parity" in only:
        import optax as _optax
        from fidelityfusion_tpu.train.fit import adam_scan, adam_scan_aux

        steps = 48

        @jax.jit
        def train_exact():
            _, good, losses = adam_scan(
                lambda pp: hogp.nll(pp, x, y), p0, opt, steps
            )
            return good, losses

        @jax.jit
        def train_tracked():
            def lt(pp, aux, t):
                return hogp.nll_tracked(pp, aux, t, x, y, refresh_every=16)

            _, good, losses, (V, mres) = adam_scan_aux(
                lt, p0, hogp.tracking_aux0(n), opt, steps
            )
            return good, losses, mres

        ge, le = train_exact()
        gt, lt_, mres = train_tracked()
        nll_at = jax.jit(lambda pp: hogp.nll(pp, x, y))
        ne, nt = float(nll_at(ge)), float(nll_at(gt))
        print(f"on-chip parity over {steps} steps: exact NLML {ne:.6f} "
              f"tracked NLML {nt:.6f} dnll {nt-ne:+.2e} "
              f"max_res {float(mres):.4f}", flush=True)

    # --- Adam overhead
    def adam_only(carry):
        p, s = carry
        g = jax.tree.map(jnp.ones_like, p)
        u, s = opt.update(g, s, p)
        return (optax.apply_updates(p, u), s), p["noise_variance"][0]

    timed("adam only", adam_only, 10, 110, tag="adam")


if __name__ == "__main__":
    main()
