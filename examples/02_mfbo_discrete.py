"""Example 2: discrete multi-fidelity Bayesian optimization on Forrester.

Equivalent of `Experiments/MFBO_discrete/MF_BO_discrete.py:33-152`:

    python examples/02_mfbo_discrete.py [--cpu]
"""

import argparse
import os as _os, sys as _sys
_sys.path.append(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

parser = argparse.ArgumentParser()
parser.add_argument("--cpu", action="store_true")
parser.add_argument("--iterations", type=int, default=6)
args = parser.parse_args()
if args.cpu:
    import jax

    jax.config.update("jax_platforms", "cpu")

from fidelityfusion_tpu.bo import mf_bo_discrete
from fidelityfusion_tpu.data.objectives import Forrester

record = mf_bo_discrete(
    Forrester(2),
    method="UCB",
    model_name="AR",
    bo_iterations=args.iterations,
    init_index={1: 10, 2: 4},
    seed=0,
    verbose=True,
)
print("incumbents:", [round(v, 3) for v in record["incumbents"]])
print("cost:", record["cost"])
