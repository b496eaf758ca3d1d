"""Measure the cached exported-posterior win (VERDICT r3 item 3).

Round 4 moved the per-stage O(n^3) factorization out of
`ARPosterior.__call__` and into `AR.export_posterior`
(`models/cigp.py:posterior_cache`), so each acquisition evaluation is
cross-Gram + GEMMs only.  Two honest numbers for BASELINE.md:

  1. acquisition evaluations/s through the exported cascade, cached
     (shipping) vs the round-3 re-factorizing call — the "before" path
     is replicated VERBATIM from the round-3 `ARPosterior.__call__`
     (`git show 1e4cbb8:fidelityfusion_tpu/models/ar.py`), evaluated on
     identical state + candidate batches;
  2. full `mf_bo_discrete` wall-clock (reference protocol config:
     Forrester, UCB, 10 iterations): `--loop` times the shipping loop;
     `--loop --ablate` monkeypatches `ARPosterior.__call__` back to the
     re-factorizing path on the SAME trajectory (prediction parity ~5e-5
     keeps every acquisition decision identical), isolating the cache
     from the round-4 UCB-gate change.  `--chain` measures per-eval
     device time by chain-difference (naive per-call timing over the
     tunnel is latency-dominated).

Sizes: the reference protocol's loop ends near n=(20,14); the cascade
win grows as n^3/n^2, so both a protocol-scale and a production-scale
(n=512/256) fixture are measured.

Run: python scripts/measure_cached_posterior.py [--loop] [--cpu]
     (--cpu pins the CPU backend — the env's JAX_PLATFORMS=cpu alone does
     NOT stick here: the axon plugin re-registers itself in
     jax.config.jax_platforms at import, so only config.update pins it)
"""

import os
import sys
import time

import numpy as np

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if "--cpu" in sys.argv:
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from fidelityfusion_tpu.models.ar import AR, train_AR
from fidelityfusion_tpu.models.data_manager import MultiFidelityDataManager
from fidelityfusion_tpu.ops.kernels import SquaredExponentialKernel


def bench(fn, reps=20):
    jax.block_until_ready(fn())  # compile
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        ts.append(time.perf_counter() - t0)
    ts = sorted(ts)
    return ts[len(ts) // 2], ts[0], ts[-1]


def make_model(n_low, n_high, seed=0):
    rng = np.random.default_rng(seed)
    xl = np.sort(rng.random((n_low, 1)).astype(np.float32), axis=0)
    xh = xl[:n_high]
    yl = (0.5 * (6 * xl - 2) ** 2 * np.sin(12 * xl - 4)
          + 10 * (xl - 0.5) - 5).astype(np.float32)
    yh = ((6 * xh - 2) ** 2 * np.sin(12 * xh - 4)).astype(np.float32)
    dm = MultiFidelityDataManager([
        {"raw_fidelity_name": "0", "fidelity_indicator": 0, "X": xl, "Y": yl},
        {"raw_fidelity_name": "1", "fidelity_indicator": 1, "X": xh, "Y": yh},
    ])
    model = AR(2, [SquaredExponentialKernel() for _ in range(2)],
               input_dim=1)
    train_AR(model, dm, max_iter=30, lr_init=0.01, n_restarts=1)
    return model, dm


def refactorizing_call(gps, to_fidelity, state, x_raw):
    """Round-3 `ARPosterior.__call__` verbatim (modulo the y it needs in
    state): per-stage `predict_diag` -> one Cholesky per stage per call."""
    x_raw = jnp.asarray(x_raw, jnp.float32)
    mean = var = None
    for i in range(to_fidelity + 1):
        st = state["stages"][i]
        xt = (x_raw - st["x_mean"]) / st["x_std"]
        m, v = gps[i].predict_diag(st["gp"], st["x"], st["y"], xt,
                                   mask=st["mask"])
        if i == 0:
            mean, var = m, v
        else:
            rho, shift, scale = st["rho"], st["shift"], st["scale"]
            mean = rho * mean + (shift + scale * m)
            var = rho**2 * var + scale**2 * v
    y_mean, y_std = state["y_norm"]
    return mean * y_std + y_mean, var * y_std**2


def stage_evals(n_low, n_high, n_cand=256):
    model, dm = make_model(n_low, n_high)
    post, state = model.export_posterior(dm, diag=True)

    # graft the per-stage training targets the round-3 path consumed
    # (export_posterior stopped storing them when the cache landed)
    for i, st in enumerate(state["stages"]):
        if i == 0:
            _, y = dm.get_data(0, normal=True)
        else:
            y = dm.get_data_by_name(f"res-{i}")[1]
            y = y[0] if isinstance(y, list) else y
        st["y"] = jnp.asarray(y, jnp.float32)

    rng = np.random.default_rng(1)
    xc = jnp.asarray(rng.random((n_cand, 1)), jnp.float32)

    cached = jax.jit(lambda s, x: post(s, x))
    before = jax.jit(lambda s, x: refactorizing_call(
        tuple(model.gp_list), post.to_fidelity, s, x))

    mc, vc = cached(state, xc)
    mb, vb = before(state, xc)
    dm_, dv_ = (float(jnp.max(jnp.abs(mc - mb))),
                float(jnp.max(jnp.abs(vc - vb))))

    tc, lc, hc = bench(lambda: cached(state, xc)[0])
    tb, lb, hb = bench(lambda: before(state, xc)[0])
    print(f"n=({n_low},{n_high}) x {n_cand} candidates | "
          f"cached {tc*1e3:.3f} ms [{lc*1e3:.3f},{hc*1e3:.3f}] "
          f"({n_cand/tc:,.0f} evals/s) | refactorizing {tb*1e3:.3f} ms "
          f"[{lb*1e3:.3f},{hb*1e3:.3f}] ({n_cand/tb:,.0f} evals/s) | "
          f"speedup {tb/tc:.2f}x | parity dmean {dm_:.2e} dvar {dv_:.2e}",
          flush=True)


def stage_evals_chain(n_low, n_high, n_cand=256):
    """Per-eval cost via the chain-difference method (naive per-call
    timing over the tunneled chip is latency-dominated — every call above
    read ~24 ms regardless of n; see utils/profiling.device_time).  A
    `lax.scan` of L posterior evaluations inside ONE jitted call, with a
    carry-dependent input perturbation so XLA cannot hoist the loop body;
    (long - short) / dL isolates the per-evaluation device time."""
    from jax import lax

    model, dm = make_model(n_low, n_high)
    post, state = model.export_posterior(dm, diag=True)
    for i, st in enumerate(state["stages"]):
        if i == 0:
            _, y = dm.get_data(0, normal=True)
        else:
            y = dm.get_data_by_name(f"res-{i}")[1]
            y = y[0] if isinstance(y, list) else y
        st["y"] = jnp.asarray(y, jnp.float32)

    rng = np.random.default_rng(1)
    xc = np.asarray(rng.random((n_cand, 1)), np.float32)
    gps = tuple(model.gp_list)

    def mk(call):
        def mk_L(L):
            def fn():
                def body(c, _):
                    m, v = call(state, xc + 1e-12 * c)
                    return c + jnp.sum(m) * 1e-9, None

                out, _ = lax.scan(body, jnp.float32(0.0), None, length=L)
                return out

            return jax.jit(fn)

        # 256-step window: the cached eval is O(us) on-device — a short
        # window leaves the difference under the tunnel's ~0.1 ms noise
        f1, f2 = mk_L(2), mk_L(258)
        jax.block_until_ready(f1()); jax.block_until_ready(f2())
        diffs = []
        for _ in range(5):
            t0 = time.perf_counter(); jax.block_until_ready(f2())
            t2 = time.perf_counter() - t0
            t0 = time.perf_counter(); jax.block_until_ready(f1())
            t1 = time.perf_counter() - t0
            diffs.append((t2 - t1) / 256)
        diffs.sort()
        return diffs[len(diffs) // 2]

    per_c = mk(lambda s, x: post(s, x))
    per_b = mk(lambda s, x: refactorizing_call(gps, post.to_fidelity, s, x))
    print(f"chain n=({n_low},{n_high}) x {n_cand} cand | cached "
          f"{per_c*1e3:.3f} ms/eval-batch ({n_cand/per_c:,.0f} evals/s) | "
          f"refactorizing {per_b*1e3:.3f} ({n_cand/per_b:,.0f}) | "
          f"speedup {per_b/per_c:.2f}x", flush=True)


def loop_wallclock(ablate=False):
    """Full-loop wall-clock; --ablate monkeypatches `ARPosterior.__call__`
    back to the round-3 re-factorizing path (same state, same trajectory —
    prediction parity is ~5e-5 so every acquisition decision matches),
    isolating the cache's effect from the round-4 UCB-gate change."""
    from fidelityfusion_tpu.bo.loop import mf_bo_discrete
    from fidelityfusion_tpu.data.objectives import Forrester
    from fidelityfusion_tpu.models import ar as ar_mod

    if ablate:
        orig_export = ar_mod._export_cascade

        def export_with_y(model, data_manager, to_fidelity=None, diag=True,
                          pad_multiple=None):
            post, state = orig_export(model, data_manager, to_fidelity,
                                      diag, pad_multiple)
            level = post.to_fidelity
            from fidelityfusion_tpu.models.ar import pad_with_mask
            for i, st in enumerate(state["stages"]):
                if i == 0:
                    x_tr, y = data_manager.get_data(0, normal=True)
                else:
                    x_tr, y = data_manager.get_data_by_name(f"res-{i}")
                    y = y[0] if isinstance(y, list) else y
                if pad_multiple:
                    _, y, _ = pad_with_mask(x_tr, y, pad_multiple)
                st["y"] = jnp.asarray(y, jnp.float32)
            return post, state

        def refact(self, state, x_raw):
            return refactorizing_call(self.gps, self.to_fidelity, state,
                                      x_raw)

        ar_mod._export_cascade = export_with_y
        ar_mod.ARPosterior.__call__ = refact

    obj = Forrester(2)
    t0 = time.perf_counter()
    mf_bo_discrete(obj, method="UCB", bo_iterations=10, seed=0)
    t1 = time.perf_counter() - t0
    # second run reuses jit caches across iterations/shape buckets —
    # the steady-state number a sweep sees
    t0 = time.perf_counter()
    mf_bo_discrete(obj, method="UCB", bo_iterations=10, seed=1)
    t2 = time.perf_counter() - t0
    tree = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    tag = "ABLATED (refactorizing)" if ablate else "cached"
    print(f"mf_bo_discrete UCB 10 iters [{tree}] {tag}: cold {t1:.1f}s, "
          f"warm {t2:.1f}s", flush=True)


def main():
    print("devices:", jax.devices(), flush=True)
    if "--loop" in sys.argv:
        loop_wallclock(ablate="--ablate" in sys.argv)
        return
    if "--chain" in sys.argv:
        stage_evals_chain(20, 14)    # reference protocol end-of-loop scale
        stage_evals_chain(128, 64)   # mid
        stage_evals_chain(512, 256)  # production scale
        stage_evals_chain(2048, 1024)
        return
    stage_evals(20, 14)     # reference protocol end-of-loop scale
    stage_evals(128, 64)    # mid
    stage_evals(512, 256)   # production scale


if __name__ == "__main__":
    main()
