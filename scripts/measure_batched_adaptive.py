"""Batched adaptive refresh throughput (VERDICT r4 weak #4 / item 6).

Compares, at n=1024 (32,32,32) fields with R=4 vmapped restarts
(hogp1024-class stages under the restart ladder):

  static   the shipping static calendar (refresh_every=64) through
           `fit_restarts` — every 64th step pays the BATCHED eigh;
  adaptive the round-5 two-level segmented schedule
           (`train/fit.py:fit_restarts_tracked_adaptive`, segment=16,
           tau=0.1) — between segments the host gates ONE batched eigh
           on the batch-max tracked residual.

Wall-clock of a WARM full run (both paths compiled on a first
invocation; the segmented driver's host round-trips are part of its
honest cost), plus end-of-run parity: the exact NLML evaluated at each
winner's params.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/measure_batched_adaptive.py
"""

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from fidelityfusion_tpu.models.gar import _Gar0LossTracked
    from fidelityfusion_tpu.models.hogp import HOGP
    from fidelityfusion_tpu.ops.kernels import SquaredExponentialKernel
    from fidelityfusion_tpu.train.fit import (
        fit_restarts,
        fit_restarts_tracked_adaptive,
        perturb_params,
    )

    R, n, shape, steps = 4, 1024, (32, 32, 32), 128
    if jax.devices()[0].platform == "cpu":
        R, n, shape, steps = 3, 128, (8, 8), 32
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((n, 2)) * 4, jnp.float32)
    y = jnp.asarray(rng.standard_normal((n,) + shape), jnp.float32)
    hogp = HOGP(kernel=SquaredExponentialKernel(), output_shape=shape)
    batch = perturb_params(
        jax.random.PRNGKey(0), {"hogp": hogp.init_params(2)}, scale=0.2, n=R
    )
    aux0 = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a, (R,) + a.shape),
        hogp.tracking_aux0(n),
    )
    BIG = 1 << 20

    def run_static():
        best, res = fit_restarts(
            _Gar0LossTracked(hogp, refresh_every=64), batch, steps=steps,
            lr=1e-2, loss_args=(x, y), aux0=aux0,
        )
        jax.block_until_ready(res.losses)
        return best, np.asarray(res.losses)

    def run_adaptive():
        best, res, refreshed = fit_restarts_tracked_adaptive(
            _Gar0LossTracked(hogp, refresh_every=BIG), batch, aux0,
            steps=steps, lr=1e-2, segment=16, res_threshold=0.1,
            loss_args=(x, y),
        )
        jax.block_until_ready(res.losses)
        return best, np.asarray(res.losses), refreshed

    # warm both
    print("compiling...", flush=True)
    run_static()
    run_adaptive()

    t0 = time.time()
    best_s, losses_s = run_static()
    t_static = time.time() - t0
    t0 = time.time()
    best_a, losses_a, refreshed = run_adaptive()
    t_adaptive = time.time() - t0

    print(f"static refresh=64:  {t_static:.2f} s "
          f"({R*steps/t_static:.1f} agg steps/s)", flush=True)
    print(f"adaptive seg=16 tau=0.1: {t_adaptive:.2f} s "
          f"({R*steps/t_adaptive:.1f} agg steps/s); "
          f"refreshed segments: {refreshed} "
          f"(static pays {steps//64 + 1} batched eighs, adaptive "
          f"{len(refreshed)})", flush=True)

    # end-of-run parity: exact NLML at each winner
    loss_exact = jax.jit(lambda p: hogp.nll(p["hogp"], x, y))
    vs = float(loss_exact(best_s))
    va = float(loss_exact(best_a))
    print(f"exact NLML at winner: static {vs:.6f} adaptive {va:.6f} "
          f"(d={va-vs:+.2e})", flush=True)


if __name__ == "__main__":
    main()
