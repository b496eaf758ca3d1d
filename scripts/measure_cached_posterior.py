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
     Forrester, UCB, 10 iterations) under the current tree vs a round-3
     worktree, same seed — pass --loop and optionally BEFORE_TREE=<path>
     pointing at a checkout of 1e4cbb8.

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


def loop_wallclock():
    from fidelityfusion_tpu.bo.loop import mf_bo_discrete
    from fidelityfusion_tpu.data.objectives import Forrester

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
    print(f"mf_bo_discrete UCB 10 iters [{tree}]: cold {t1:.1f}s, "
          f"warm {t2:.1f}s", flush=True)


def main():
    print("devices:", jax.devices(), flush=True)
    if "--loop" in sys.argv:
        loop_wallclock()
        return
    stage_evals(20, 14)     # reference protocol end-of-loop scale
    stage_evals(128, 64)    # mid
    stage_evals(512, 256)   # production scale


if __name__ == "__main__":
    main()
