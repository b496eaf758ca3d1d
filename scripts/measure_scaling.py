"""Weak-scaling measurement of mesh-sharded restart training.

Runs `parallel/multihost.py:restart_scaling_efficiency` on the virtual
8-device CPU mesh (the only multi-device surface in this environment) at
D in {1, 2, 4, 8} with 4 restarts per device, and writes
MULTICHIP_SCALING.json at the repo root.

HONESTY NOTE (recorded in the artifact + BASELINE.md): this host has 2
physical cores and the D=1 baseline already uses BOTH via XLA intra-op
threading, so adding virtual devices DIVIDES fixed silicon instead of
adding it — measured D=2 efficiency ~0.39 even with one restart per
device, and D=8 thrashes 8 device executors on 2 cores (~0.01).  The
virtual mesh validates CORRECTNESS of the sharded programs (see
`dryrun_multichip` and tests/test_parallel.py); scaling efficiency is
only measurable on real multi-chip hardware, where the restart axis is
embarrassingly parallel (one all-gather at the final argmax).
"""

import json
import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
).strip()
sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    from fidelityfusion_tpu.parallel.multihost import restart_scaling_efficiency

    n_cores = os.cpu_count() or 1
    results = restart_scaling_efficiency(
        n=256, steps=100, restarts_per_device=4,
        device_counts=(1, 2, 4, 8), reps=3,
    )
    out = {
        "protocol": "weak scaling: D*4 NLML-Adam restarts (n=256, 100 steps) "
                    "sharded over a D-device mesh; efficiency = t(1)/t(D)",
        "host_physical_cores": n_cores,
        "virtual_devices": 8,
        "results": {k: round(v, 4) for k, v in results.items()},
        "oversubscription_bound": {
            f"D{d}": round(min(1.0, n_cores / d), 4) for d in (1, 2, 4, 8)
        },
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "MULTICHIP_SCALING.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
