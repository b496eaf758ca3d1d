"""Measure the n-axis sharded Kronecker/HOGP program
(`parallel/kron_nsharded.py`) — VERDICT r4 "missing" #1's measurement
half.

Two honest numbers for BASELINE.md:

  1. single-chip overhead: the sharded tracked NLML+grad+Adam step on a
     1-device mesh vs the unsharded tracked path
     (`models/hogp.py:nll_tracked`) at the same n — what one chip pays
     for the distributed program structure.  Chain-difference timing
     (naive per-call over the tunnel is latency-dominated); measured on
     TRACKED steps only (pure-tracking large-n mode: the step-0 eigh is
     amortized over the whole run).
  2. virtual-mesh execution shape on the 8-device CPU mesh (indicative
     only — 2 physical cores).

Run TPU:  PYTHONPATH=/root/repo python scripts/measure_kron_nsharded.py
Run CPU:  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
          PYTHONPATH=/root/repo python scripts/measure_kron_nsharded.py
"""

import os
import sys
import time

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from fidelityfusion_tpu.models.hogp import HOGP
from fidelityfusion_tpu.ops.kernels import SquaredExponentialKernel
from fidelityfusion_tpu.parallel.kron_nsharded import (
    hogp_nll_tracked_nsharded,
)
from fidelityfusion_tpu.parallel.nsharded import make_n_mesh
from fidelityfusion_tpu.train.fit import adam_scan_aux


def chain(make_fn, L1, L2, reps=3):
    f1, f2 = make_fn(L1), make_fn(L2)
    float(f1())
    float(f2())

    def once(f):
        t0 = time.time()
        float(f())
        return time.time() - t0

    diffs = sorted((once(f2) - once(f1)) / (L2 - L1) for _ in range(reps))
    return diffs[len(diffs) // 2], diffs[0], diffs[-1]


def main():
    devs = jax.devices()
    print(f"devices: {len(devs)} x {devs[0].device_kind}", flush=True)
    rng = np.random.default_rng(0)
    n, shape = (1024, (32, 32, 32)) if devs[0].platform != "cpu" else (
        256, (8, 8))
    big = 1 << 20  # pure tracking: no refresh inside the measured chain
    x = jnp.asarray(rng.random((n, 2)) * 4, jnp.float32)
    y = jnp.asarray(rng.standard_normal((n,) + shape), jnp.float32)
    hogp = HOGP(kernel=SquaredExponentialKernel(), output_shape=shape)
    p0 = hogp.init_params(2)
    opt = optax.adam(1e-2)
    # warm eigenbasis so every measured step is a TRACKED step
    K0 = hogp.kernel.apply(p0["kernel"], x, x) + hogp.jitter * jnp.eye(n)
    _, V0 = jnp.linalg.eigh(K0)
    aux0 = (V0, jnp.zeros((), jnp.float32))

    def mk_unsharded(L):
        def loss(p, aux, step):
            return hogp.nll_tracked(p, aux, step, x, y, refresh_every=big)

        def fn():
            _, _, losses, _ = adam_scan_aux(
                loss, p0, aux0, opt, L, step0=1.0
            )
            return jnp.sum(losses) * 1e-6

        return jax.jit(fn)

    med, lo, hi = chain(mk_unsharded, 3, 9)
    print(f"unsharded tracked step n={n} {shape}: {med*1e3:.2f} ms "
          f"[{lo*1e3:.2f},{hi*1e3:.2f}] -> {1/med:.1f} steps/s", flush=True)

    for P in (1, len(devs)) if len(devs) > 1 else (1,):
        mesh = make_n_mesh(P)

        def mk_sharded(L, mesh=mesh):
            def loss(p, aux, step):
                return hogp_nll_tracked_nsharded(
                    hogp, p, aux, step, x, y, mesh, refresh_every=big
                )

            def fn():
                _, _, losses, _ = adam_scan_aux(
                    loss, p0, aux0, opt, L, step0=1.0
                )
                return jnp.sum(losses) * 1e-6

            return jax.jit(fn)

        med_s, lo, hi = chain(mk_sharded, 3, 9)
        print(f"sharded P={P} tracked step: {med_s*1e3:.2f} ms "
              f"[{lo*1e3:.2f},{hi*1e3:.2f}] "
              f"(overhead {100*(med_s-med)/med:+.1f}%)", flush=True)


if __name__ == "__main__":
    main()
