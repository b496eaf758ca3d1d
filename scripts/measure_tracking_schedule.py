"""Tune the tracked-spectrum refresh schedule on-chip.

Stage `sched1024`: amortized step time + on-chip training parity at
n=1024/(32,32,32) for refresh_every in {16, 32, 64}.

Stage `eigh4096`: one full eigh(4096) with eigenvectors used (the
refresh cost that bounds tracking at n=4096).

Stage `hogp4096`: tracked amortized step at n=4096/(16,16,16) — the
scale demo (exact eigh would dominate; tracking makes it trainable).

Run: python scripts/measure_tracking_schedule.py <stage ...>
"""
import os
import sys
import time

import numpy as np

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def chain(make_fn, L1, L2, reps=3):
    f1, f2 = make_fn(L1), make_fn(L2)
    float(f1()); float(f2())

    def once(f):
        t0 = time.time()
        float(f())
        return time.time() - t0

    diffs = sorted((once(f2) - once(f1)) / (L2 - L1) for _ in range(reps))
    return diffs[len(diffs) // 2], diffs[0], diffs[-1]


def setup(n, shape, seed=0):
    import jax.numpy as jnp
    import optax

    from fidelityfusion_tpu.models.hogp import HOGP
    from fidelityfusion_tpu.ops.kernels import SquaredExponentialKernel

    rng = np.random.default_rng(seed)
    x = (rng.random((n, 1)) * 10).astype(np.float32)
    y = rng.standard_normal((n,) + shape).astype(np.float32)
    hogp = HOGP(kernel=SquaredExponentialKernel(), output_shape=shape)
    p0 = hogp.init_params(1)
    return hogp, p0, x, y, optax.adam(1e-2)


def main():
    import jax
    import jax.numpy as jnp

    from fidelityfusion_tpu.train.fit import adam_scan, adam_scan_aux

    stages = sys.argv[1:] or ["sched1024"]
    print("devices:", jax.devices(), "stages:", stages, flush=True)

    if "sched1024" in stages:
        n, shape = 1024, (32, 32, 32)
        hogp, p0, x, y, opt = setup(n, shape)
        aux0 = (np.eye(n, dtype=np.float32), np.zeros((), np.float32))

        # exact reference params for parity
        @jax.jit
        def train_exact():
            _, good, _ = adam_scan(lambda pp: hogp.nll(pp, x, y), p0, opt, 48)
            return good

        ge = train_exact()
        nll_at = jax.jit(lambda pp: hogp.nll(pp, x, y))
        ne = float(nll_at(ge))

        for refresh in (16, 32, 64, 128):
            def mk(L, r=refresh):
                def fn():
                    def lt(pp, aux, t):
                        return hogp.nll_tracked(pp, aux, t, x, y,
                                                refresh_every=r)

                    _, _, losses, _ = adam_scan_aux(lt, p0, aux0, opt, L)
                    return jnp.sum(losses) * 1e-6

                return jax.jit(fn)

            # window spans the refresh cycle: steps [L1, L2) include
            # L2/r refreshes, so the estimate is amortized
            L1, L2 = {16: (2, 34), 32: (2, 66), 64: (2, 66),
                      128: (2, 130)}[refresh]
            med, lo, hi = chain(mk, L1, L2)

            @jax.jit
            def train_tracked(r=refresh):
                def lt(pp, aux, t):
                    return hogp.nll_tracked(pp, aux, t, x, y, refresh_every=r)

                _, good, _, (V, mres) = adam_scan_aux(lt, p0, aux0, opt, 48)
                return good, mres

            gt, mres = train_tracked()
            nt = float(nll_at(gt))
            print(f"refresh={refresh}: {med*1e3:.2f} ms/step "
                  f"[{lo*1e3:.2f},{hi*1e3:.2f}] -> {1/med:.0f} steps/s | "
                  f"parity dnll {nt-ne:+.2e} max_res {float(mres):.4f}",
                  flush=True)

    if "adaptive1024" in stages:
        # residual-gated refresh (hogp.nll_tracked_adaptive): measure the
        # amortized step over a 128-step window and report how many
        # refreshes the gate actually bought + training parity
        n, shape = 1024, (32, 32, 32)
        hogp, p0, x, y, opt = setup(n, shape)
        aux0 = (np.eye(n, dtype=np.float32), np.zeros((), np.float32),
                np.zeros((), np.float32))

        @jax.jit
        def train_exact():
            _, good, _ = adam_scan(lambda pp: hogp.nll(pp, x, y), p0, opt, 48)
            return good

        ge = train_exact()
        nll_at = jax.jit(lambda pp: hogp.nll(pp, x, y))
        ne = float(nll_at(ge))

        for tau in (0.02, 0.05, 0.1):
            def mk(L, tau=tau):
                def fn():
                    def lt(pp, aux, t):
                        return hogp.nll_tracked_adaptive(
                            pp, aux, t, x, y, max_gap=128,
                            res_threshold=tau)

                    _, _, losses, _ = adam_scan_aux(lt, p0, aux0, opt, L)
                    return jnp.sum(losses) * 1e-6

                return jax.jit(fn)

            med, lo, hi = chain(mk, 2, 130)

            @jax.jit
            def train_adaptive(tau=tau):
                def lt(pp, aux, t):
                    return hogp.nll_tracked_adaptive(
                        pp, aux, t, x, y, max_gap=128, res_threshold=tau)

                # count refreshes: res == 0 exactly on refresh steps
                def body(carry, t):
                    (p, s, aux) = carry
                    (loss, aux2), g = jax.value_and_grad(
                        lt, has_aux=True)(p, aux, t)
                    u, s = opt.update(g, s, p)
                    return (optax.apply_updates(p, u), s, aux2), aux2[2]

                import optax
                s0 = opt.init(p0)
                (pf, _, auxf), res_seq = jax.lax.scan(
                    body, (p0, s0, aux0), jnp.arange(48, dtype=jnp.float32))
                return pf, auxf[1], jnp.sum(res_seq == 0.0)

            pf, mres, n_refresh = train_adaptive()
            nt = float(nll_at(pf))
            print(f"adaptive tau={tau}: {med*1e3:.2f} ms/step "
                  f"[{lo*1e3:.2f},{hi*1e3:.2f}] -> {1/med:.0f} steps/s | "
                  f"refreshes {int(n_refresh)}/48 | parity dnll "
                  f"{nt-ne:+.2e} max_res {float(mres):.4f}", flush=True)

    if "longrun1024" in stages:
        # long-horizon drift: does PURE tracking (eigh only at step 0,
        # Jacobi sweeps forever) hold training parity over 512 steps?
        # If yes, the n=4096 refresh wall (4.5 s eigh, 57% of a 64-step
        # cycle) can be dodged entirely on long runs.
        n, shape = 1024, (32, 32, 32)
        hogp, p0, x, y, opt = setup(n, shape)
        aux0 = (np.eye(n, dtype=np.float32), np.zeros((), np.float32))
        STEPS = 512

        @jax.jit
        def train_exact():
            _, good, losses = adam_scan(
                lambda pp: hogp.nll(pp, x, y), p0, opt, STEPS)
            return good, losses[-1]

        t0 = time.time()
        ge, le = train_exact()
        nll_at = jax.jit(lambda pp: hogp.nll(pp, x, y))
        ne = float(nll_at(ge))
        print(f"longrun exact: {STEPS} steps in {time.time()-t0:.0f}s, "
              f"final NLML {ne:.6f}", flush=True)

        for refresh, sweeps in ((64, 1), (1 << 20, 1), (1 << 20, 2)):
            @jax.jit
            def train_tracked(r=refresh, sw=sweeps):
                def lt(pp, aux, t):
                    return hogp.nll_tracked(pp, aux, t, x, y,
                                            refresh_every=r, sweeps=sw)

                _, good, _, (V, mres) = adam_scan_aux(lt, p0, aux0, opt,
                                                      STEPS)
                return good, mres

            t0 = time.time()
            gt, mres = train_tracked()
            nt = float(nll_at(gt))
            tag = (f"refresh={refresh}" if refresh < STEPS
                   else f"PURE sweeps={sweeps}")
            print(f"longrun {tag}: {STEPS} steps in {time.time()-t0:.0f}s "
                  f"| parity dnll {nt-ne:+.2e} max_res {float(mres):.4f}",
                  flush=True)

    if "eigh4096" in stages:
        rng = np.random.default_rng(0)
        xs = (rng.random((4096, 1)) * 10).astype(np.float32)
        K = np.exp(-0.5 * (xs - xs.T) ** 2).astype(np.float32)
        K += 1e-3 * np.eye(4096, dtype=np.float32)

        @jax.jit
        def one(M):
            w, V = jnp.linalg.eigh(M)
            return jnp.sum(w) + jnp.sum(V[0])

        t0 = time.time()
        float(one(K))
        print(f"eigh4096 compile+first: {time.time()-t0:.1f}s", flush=True)
        ts = []
        for _ in range(3):
            t0 = time.time()
            float(one(K))
            ts.append(time.time() - t0)
        print(f"eigh4096 (vectors used, per-call): {sorted(ts)[1]*1e3:.0f} ms "
              f"[{min(ts)*1e3:.0f},{max(ts)*1e3:.0f}]", flush=True)

    if "hogp4096pure" in stages:
        # PURE tracking at n=4096: sustained step rate (chain window with
        # no refresh inside) + 128-step agreement between pure tracking
        # and refresh=64, both scored by the EXACT NLML at the end
        # (n=1024 longrun pins parity vs exact; this pins that the two
        # schedules coincide at 4096 too).
        n, shape = 4096, (16, 16, 16)
        hogp, p0, x, y, opt = setup(n, shape)
        aux0 = (np.eye(n, dtype=np.float32), np.zeros((), np.float32))
        PURE = 1 << 20

        def mk(L):
            def fn():
                def lt(pp, aux, t):
                    # start the scan at step 1: no scheduled refresh ever
                    # fires inside the window (step-0 eigh paid once in
                    # both chains)
                    return hogp.nll_tracked(pp, aux, t + 1.0, x, y,
                                            refresh_every=PURE)

                _, _, losses, _ = adam_scan_aux(lt, p0, aux0, opt, L)
                return jnp.sum(losses) * 1e-6

            return jax.jit(fn)

        med, lo, hi = chain(mk, 2, 34)
        print(f"hogp4096 PURE sustained: {med*1e3:.2f} ms/step "
              f"[{lo*1e3:.2f},{hi*1e3:.2f}] -> {1/med:.1f} steps/s",
              flush=True)

        nll_exact = jax.jit(lambda pp: hogp.nll(pp, x, y))
        finals = {}
        for refresh in (64, PURE):
            @jax.jit
            def train(r=refresh):
                def lt(pp, aux, t):
                    return hogp.nll_tracked(pp, aux, t, x, y,
                                            refresh_every=r)

                _, good, _, (V, mres) = adam_scan_aux(lt, p0, aux0, opt,
                                                      128)
                return good, mres

            t0 = time.time()
            gt, mres = train()
            nt = float(nll_exact(gt))
            finals[refresh] = nt
            tag = "refresh=64" if refresh == 64 else "PURE"
            print(f"hogp4096 {tag}: 128 steps in {time.time()-t0:.0f}s, "
                  f"exact NLML {nt:.6f}, max_res {float(mres):.4f}",
                  flush=True)
        print(f"hogp4096 schedule agreement dnll "
              f"{finals[PURE]-finals[64]:+.2e}", flush=True)

    if "hogp4096" in stages:
        n, shape = 4096, (16, 16, 16)
        hogp, p0, x, y, opt = setup(n, shape)
        aux0 = (np.eye(n, dtype=np.float32), np.zeros((), np.float32))

        for refresh in (64,):
            def mk(L, r=refresh):
                def fn():
                    def lt(pp, aux, t):
                        return hogp.nll_tracked(pp, aux, t, x, y,
                                                refresh_every=r)

                    _, _, losses, _ = adam_scan_aux(lt, p0, aux0, opt, L)
                    return jnp.sum(losses) * 1e-6

                return jax.jit(fn)

            # tracked-only window (both chains pay the step-0 refresh)
            med, lo, hi = chain(mk, 2, 10)
            print(f"hogp4096 tracked step (refresh={refresh} outside window): "
                  f"{med*1e3:.2f} ms [{lo*1e3:.2f},{hi*1e3:.2f}]", flush=True)


if __name__ == "__main__":
    main()
