"""Example 5: the large-n toolbox — what to reach for when n grows.

The reference is bounded by one process and O(n^3)-per-step everything;
this framework ships three escapes, demonstrated here end-to-end:

  1. analytic-gradient SE NLML (`ops/fused_se.py`) — CIGP dispatches it
     automatically for the scalar SE kernel at n >= 512 (one GEMM
     backward; 91% of the measured speed-of-light bound at n=4096);
  2. tracked-spectrum HOGP (`models/hogp.py:nll_tracked`) — the serial
     eigh that dominates the Kronecker step is warm-started and refined
     with MXU Jacobi sweeps between scheduled refreshes (refresh_every=64
     default; 12x at n=1024, ~37x at n=4096 where one eigh is 4.5 s);
     `nll_tracked_adaptive` gates refreshes on measured drift instead
     (unbatched training);
  3. n-axis sharding (`parallel/nsharded.py`) — the training set itself
     shards over a device mesh (distributed Gram + blocked Cholesky,
     psum-reduced NLML value/grad), moving max trainable n past one
     chip's HBM; plus cached exported posteriors so BO acquisition
     evaluation never re-factorizes.

    python examples/05_large_n_scaling.py [--cpu] [--n 1024]
"""

import argparse

parser = argparse.ArgumentParser()
parser.add_argument("--cpu", action="store_true")
parser.add_argument("--n", type=int, default=512,
                    help="training rows (use 1024/4096 on a real chip)")
args = parser.parse_args()
if args.cpu:
    import jax

    jax.config.update("jax_platforms", "cpu")

import os as _os, sys as _sys
_sys.path.append(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

import numpy as np
import jax
import jax.numpy as jnp
import optax

from fidelityfusion_tpu.models.cigp import CIGP
from fidelityfusion_tpu.models.hogp import HOGP
from fidelityfusion_tpu.ops.kernels import ARDKernel, SquaredExponentialKernel
from fidelityfusion_tpu.parallel.nsharded import fit_nsharded, make_n_mesh
from fidelityfusion_tpu.train.fit import adam_scan, adam_scan_aux

n = args.n
rng = np.random.default_rng(0)
print(f"devices: {jax.devices()}  n={n}")

# --- 1. single-fidelity CIGP at large n: the se-analytic fast path
x = jnp.asarray(rng.random((n, 1)) * 10, jnp.float32)
y = jnp.asarray(np.sin(np.asarray(x)), jnp.float32)
gp = CIGP(kernel=SquaredExponentialKernel())  # auto se-analytic at n>=512
p0 = gp.init_params(1)
t0 = time.time()
_, good, losses = jax.jit(
    lambda p: adam_scan(lambda pp: gp.nll(pp, x, y), p, optax.adam(5e-2), 60)
)(p0)
jax.block_until_ready(losses)
print(f"[1] CIGP se-analytic n={n}: 60 steps in {time.time()-t0:.1f}s "
      f"(incl. compile), NLML {float(losses[0]):.2f} -> {float(losses[-1]):.2f}")

# --- 2. HOGP tensor outputs with the tracked spectrum
shape = (16, 16)
yt = jnp.asarray(
    np.sin(np.asarray(x))[:, :, None]
    * np.outer(np.linspace(0, 1, shape[0]), np.linspace(0, 1, shape[1]))[None]
    + 0.05 * rng.standard_normal((n,) + shape),
    jnp.float32,
)
hogp = HOGP(kernel=SquaredExponentialKernel(), output_shape=shape)
hp0 = hogp.init_params(1)
aux0 = (np.eye(n, dtype=np.float32), np.zeros((), np.float32))

def tracked_loss(pp, aux, step):
    return hogp.nll_tracked(pp, aux, step, x, yt)  # refresh_every=64 default

t0 = time.time()
_, hgood, hlosses, (_, max_res) = adam_scan_aux(
    tracked_loss, hp0, aux0, optax.adam(1e-2), 60)
jax.block_until_ready(hlosses)
print(f"[2] HOGP tracked n={n} {shape}: 60 steps in {time.time()-t0:.1f}s, "
      f"NLML {float(hlosses[0]):.3f} -> {float(hlosses[-1]):.3f}, "
      f"max tracking residual {float(max_res):.4f}")

# --- 3. n-axis sharded training over the device mesh
mesh = make_n_mesh()  # all local devices on the "n" axis
gp2 = CIGP(kernel=ARDKernel(), se_analytic_nll=False, hybrid_nll=False)
t0 = time.time()
good2, losses2 = fit_nsharded(gp2, gp2.init_params(1), x, y, mesh,
                              steps=60, lr=5e-2)
jax.block_until_ready(losses2)
print(f"[3] n-sharded over {mesh.shape['n']} device(s): 60 steps in "
      f"{time.time()-t0:.1f}s, NLML {float(losses2[0]):.2f} -> "
      f"{float(losses2[-1]):.2f}")

# --- 4. (round 5) distributed Kronecker/HOGP training: the tracked
# step's n^3 GEMMs sharded over the mesh (pure tracking: one replicated
# eigh at step 0, GEMM-only distributed steps after)
from fidelityfusion_tpu.parallel.kron_nsharded import fit_hogp_nsharded

t0 = time.time()
kgood, klosses, _ = fit_hogp_nsharded(hogp, hp0, x, yt, mesh,
                                      steps=30, lr=1e-2)
jax.block_until_ready(klosses)
print(f"[4] Kronecker n-sharded over {mesh.shape['n']} device(s): 30 "
      f"steps in {time.time()-t0:.1f}s, NLML {float(klosses[0]):.3f} -> "
      f"{float(klosses[-1]):.3f}")

# --- 5. (round 5) restarts x n: the restart ladder and the distributed
# factorization composed on one mesh (2-D when devices allow)
from fidelityfusion_tpu.parallel.nsharded import fit_restarts_nsharded
from fidelityfusion_tpu.train.fit import perturb_params

batch = perturb_params(jax.random.PRNGKey(0), gp2.init_params(1), n=4)
t0 = time.time()
best_rn, final_rn = fit_restarts_nsharded(gp2, batch, x, y, mesh,
                                          steps=30, lr=5e-2)
print(f"[5] restarts x n (R=4): 30 steps in {time.time()-t0:.1f}s, "
      f"best final NLML {float(np.min(np.asarray(final_rn))):.2f}")

# --- 6. (round 5) one-call cascade training with n-sharded stages:
# train_AR(n_mesh=...) routes big stages through the distributed path
# automatically (threshold nshard_min_rows, default 2048) — see
# tests/test_trainer_nsharded.py for the full cascade drive.

print("done — see docs/scaling.md + BASELINE.md for the measured numbers")
