"""Multi-host initialization + scaling-efficiency measurement.

SURVEY.md §7 step 6: multi-host runs via `jax.distributed` with the
restart/candidate axes sharded over the global mesh (ICI within a slice,
DCN across hosts).  This environment exposes one real chip, so: the
initialization helper is exercised degenerately (single process), and the
scaling-efficiency harness measures the sharded-restart speedup on a
virtual device mesh — the same program that runs on a pod slice.
"""

from __future__ import annotations

import time
from typing import Dict, Optional

import numpy as np


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> Dict:
    """`jax.distributed.initialize` wrapper; no-op for single process.

    On a pod slice, every host calls this before any jax use; afterwards
    `jax.devices()` spans the slice and the `parallel/mesh.py` helpers
    shard over all of it unchanged.
    """
    import jax

    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }


def is_main_process() -> bool:
    import jax

    return jax.process_index() == 0


def restart_scaling_efficiency(
    n: int = 256,
    steps: int = 100,
    restarts_per_device: int = 4,
    device_counts=(1, None),
    reps: int = 3,
) -> Dict[str, float]:
    """Measure weak-scaling efficiency of mesh-sharded restart training.

    For each device count D (None = all), train D * restarts_per_device
    NLML-Adam restarts sharded over a D-device mesh and record the
    wall-clock; weak-scaling efficiency = t(1) / t(D) (ideal 1.0: more
    restarts in the same time).  This is the BASELINE.md scaling metric,
    runnable on the virtual CPU mesh or a real slice unchanged.
    """
    import jax
    import jax.numpy as jnp

    from fidelityfusion_tpu.models.cigp import CIGP
    from fidelityfusion_tpu.ops.kernels import SquaredExponentialKernel
    from fidelityfusion_tpu.parallel.mesh import make_mesh, sharded_fit_restarts

    rng = np.random.default_rng(0)
    x = (rng.random((n, 1)) * 20).astype(np.float32)
    y = np.sin(x).astype(np.float32)
    # hybrid_nll off: the nll runs under vmap (restart axis) where the
    # single-matrix hybrid path's batched XLA cholesky serializes
    gp = CIGP(kernel=SquaredExponentialKernel(), hybrid_nll=False)
    p0 = {
        "kernel": {
            "length_scale": np.ones(1, np.float32),
            "signal_variance": np.ones(1, np.float32),
        },
        "log_beta": np.ones(1, np.float32),
    }

    results = {}
    times = {}
    for dc in device_counts:
        D = dc or len(jax.devices())
        R = D * restarts_per_device
        batch = jax.tree_util.tree_map(
            lambda a: np.stack([a + 0.01 * i for i in range(R)]), p0
        )
        mesh = make_mesh(D)

        def run():
            # the one shared training loop (train/fit.py:adam_scan under
            # fit_restarts), restart axis sharded over the mesh
            _, result = sharded_fit_restarts(
                gp.nll, batch, mesh, steps=steps, lr=1e-2, loss_args=(x, y)
            )
            return float(jnp.sum(result.losses))

        run()  # compile
        t0 = time.time()
        for _ in range(reps):
            run()
        times[D] = (time.time() - t0) / reps
    base = times[min(times)]
    for D, t in times.items():
        results[f"time_s_D{D}"] = t
        results[f"weak_scaling_efficiency_D{D}"] = base / t
    return results
