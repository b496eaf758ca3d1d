"""Measure the n-axis sharded NLML program (`parallel/nsharded.py`).

Two honest numbers for BASELINE.md:

  1. single-chip overhead: the sharded program on a 1-device mesh vs the
     unsharded shipping path (`models/cigp.py` dispatch) at the same n —
     what one chip pays for the distributed structure when there is
     nothing to parallelize over;
  2. virtual-mesh scaling shape: the same program on the 8-device CPU
     mesh vs 1-device CPU (wall-clock only indicative — host cores, not
     chips; the real win is HBM capacity + compute split).

Run TPU:  python scripts/measure_nsharded.py
Run CPU:  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
          python scripts/measure_nsharded.py
"""

import os
import sys
import time

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from fidelityfusion_tpu.models.cigp import CIGP
from fidelityfusion_tpu.ops.kernels import ARDKernel
from fidelityfusion_tpu.parallel.nsharded import cigp_nll_nsharded, make_n_mesh


def bench(fn, reps=10):
    fn()  # compile
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        ts.append(time.perf_counter() - t0)
    ts = sorted(ts)
    return ts[len(ts) // 2], ts[0], ts[-1]


def main():
    devs = jax.devices()
    print(f"devices: {len(devs)} x {devs[0].device_kind}", flush=True)
    rng = np.random.default_rng(0)
    for n in (2048, 4096):
        d_in = 4
        x = jnp.asarray(rng.random((n, d_in)) * 4, jnp.float32)
        y = jnp.asarray(np.sin(np.asarray(x).sum(1, keepdims=True)),
                        jnp.float32)
        gp = CIGP(kernel=ARDKernel(), se_analytic_nll=False,
                  hybrid_nll=False)
        p = gp.init_params(d_in)

        grad_un = jax.jit(jax.value_and_grad(lambda pp: gp.nll(pp, x, y)))
        m, lo, hi = bench(lambda: grad_un(p)[0])
        print(f"n={n} unsharded fused NLML+grad: {m*1e3:.2f} ms "
              f"[{lo*1e3:.2f},{hi*1e3:.2f}]", flush=True)

        for P in {1, len(devs)}:
            mesh = make_n_mesh(P)
            grad_sh = jax.jit(jax.value_and_grad(
                lambda pp: cigp_nll_nsharded(gp, pp, x, y, mesh)))
            m, lo, hi = bench(lambda: grad_sh(p)[0])
            print(f"n={n} sharded P={P} NLML+grad: {m*1e3:.2f} ms "
                  f"[{lo*1e3:.2f},{hi*1e3:.2f}]", flush=True)

        # serving path: sharded posterior vs single-device predict_diag
        from fidelityfusion_tpu.parallel.nsharded import (
            cigp_posterior_nsharded,
        )

        xt = jnp.asarray(rng.random((256, d_in)) * 4, jnp.float32)
        pd = jax.jit(lambda pp: gp.predict_diag(pp, x, y, xt)[0])
        m, lo, hi = bench(lambda: pd(p))
        print(f"n={n} unsharded predict_diag(256): {m*1e3:.2f} ms "
              f"[{lo*1e3:.2f},{hi*1e3:.2f}]", flush=True)
        for P in {1, len(devs)}:
            mesh = make_n_mesh(P)
            ps = jax.jit(lambda pp: cigp_posterior_nsharded(
                gp, pp, x, y, xt, mesh)[0])
            m, lo, hi = bench(lambda: ps(p))
            print(f"n={n} sharded P={P} posterior(256): {m*1e3:.2f} ms "
                  f"[{lo*1e3:.2f},{hi*1e3:.2f}]", flush=True)


if __name__ == "__main__":
    main()
