"""Example 1: multi-fidelity regression with every fusion model.

Equivalent of the reference's per-model demos
(`FidelityFusion_Models/*.py` __main__ blocks) in one script:

    python examples/01_multifidelity_regression.py [--cpu]
"""

import argparse

parser = argparse.ArgumentParser()
parser.add_argument("--cpu", action="store_true")
args = parser.parse_args()
if args.cpu:
    import jax

    jax.config.update("jax_platforms", "cpu")

import os as _os, sys as _sys
_sys.path.append(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import numpy as np
import jax.numpy as jnp

from fidelityfusion_tpu.experiments.metrics import calculate_metrix
from fidelityfusion_tpu.models import (
    AR, NAR, ResGP, MultiFidelityDataManager, train_AR, train_NAR, train_ResGP,
)
from fidelityfusion_tpu.ops.kernels import SquaredExponentialKernel

# --- the canonical 3-fidelity toy sin problem
rng = np.random.default_rng(1)
x_all = rng.random((500, 1)) * 20
pick = lambda n: x_all[np.sort(rng.permutation(500)[:n])]
xs = [pick(300), pick(300), pick(250)]
noise = lambda n: rng.random((n, 1)) * 0.1 - 0.05
ys = [
    np.sin(xs[0]) - 0.5 * np.sin(2 * xs[0]) + noise(300),
    np.sin(xs[1]) - 0.3 * np.sin(2 * xs[1]) + noise(300),
    np.sin(xs[2]) + noise(250),
]
x_test = np.linspace(0, 20, 100).reshape(-1, 1)
y_test = np.sin(x_test)

dm = MultiFidelityDataManager(
    [
        {"raw_fidelity_name": str(i), "fidelity_indicator": i, "X": x, "Y": y}
        for i, (x, y) in enumerate(zip(xs, ys))
    ]
)

for name, cls, train in [("AR", AR, train_AR), ("ResGP", ResGP, train_ResGP),
                         ("NAR", NAR, train_NAR)]:
    model = cls(3, [SquaredExponentialKernel() for _ in range(3)], input_dim=1)
    train(model, dm, max_iter=300, lr_init=5e-2)
    mean, cov = model(dm, jnp.asarray(x_test, jnp.float32))
    var = np.diagonal(np.asarray(cov))
    print(name, calculate_metrix(y_test, np.asarray(mean), var))
