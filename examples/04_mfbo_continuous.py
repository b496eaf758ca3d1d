"""Example 4: continuous-fidelity Bayesian optimization on Branin.

Equivalent of `Experiments/MFBO_continuous/MF_BO_continuous.py:20-100`
(FIDES surrogate over the joint (x, z) input; fidelity z in [0.1, 1]):

    python examples/04_mfbo_continuous.py [--cpu]

Also demonstrates the per-strategy continuous acquisitions
(`bo/continuous.py`: UCB with the information-gap fidelity rule, ES, KG).
"""

import argparse
import os as _os, sys as _sys
_sys.path.append(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

parser = argparse.ArgumentParser()
parser.add_argument("--cpu", action="store_true")
parser.add_argument("--iterations", type=int, default=5)
args = parser.parse_args()
if args.cpu:
    import jax

    jax.config.update("jax_platforms", "cpu")

import jax
import jax.numpy as jnp

from fidelityfusion_tpu.bo.continuous import ContinuousFidelityES, ContinuousFidelityUCB
from fidelityfusion_tpu.bo.continuous_loop import mf_bo_continuous
from fidelityfusion_tpu.data.cost import ContinuousCost
from fidelityfusion_tpu.data.objectives import Branin

# --- the full loop (FIDES surrogate rebuilt every iteration)
record = mf_bo_continuous(Branin(), bo_iterations=args.iterations, n_init=8,
                          seed=0, verbose=True)
print("incumbents:", [round(v, 3) for v in record["incumbents"]])
print("queried fidelities:", [round(z, 2) for z in record["Z"]])

# --- standalone strategy objects over a posterior closure
def posterior(x, z):
    mean = -jnp.sum((x - 0.5) ** 2, axis=-1)
    var = jnp.ones(x.shape[0]) * (0.3 * (1.1 - jnp.asarray(z)))
    return mean, var

search_range = [[0.0, 1.0], [0.0, 1.0], [0.1, 1.0]]
ucb = ContinuousFidelityUCB(2, search_range, posterior, ContinuousCost(), seed=0)
x_u, z_u = ucb.compute_next(jax.random.PRNGKey(0))
print(f"UCB next: x={x_u.ravel()}, z={z_u:.2f}")

es = ContinuousFidelityES(2, search_range, posterior, ContinuousCost(),
                          n_candidates=32, n_mc=64)
x_e, z_e = es.compute_next()
print(f"ES next:  x={x_e.ravel()}, z={z_e:.2f}")
