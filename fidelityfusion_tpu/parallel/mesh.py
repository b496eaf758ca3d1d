"""Device-mesh utilities and sharded execution for the parallel axes.

The reference is single-process/single-device (SURVEY.md §2.8); all
multi-chip capability here is new TPU-first design.  The embarrassingly
parallel axes of the workload are:

  * hyperparameter random RESTARTS (one NLML-Adam scan each)
  * BO acquisition CANDIDATES (posterior scoring + ascent)
  * experiment sweeps (seeds x datasets x models)

These shard as pure data parallelism over a 1-D or 2-D
`jax.sharding.Mesh`; winner selection (best restart / best candidate) is a
cross-shard argmax that XLA lowers to an all-gather over ICI.  For large-n
prediction, test rows shard the K_* Gram block (`sharded_posterior_mean`),
the GP analog of tensor parallelism: each device builds only its row block
and the matmul against the shared alpha rides the MXU locally, no
collective needed on the forward.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "restart") -> Mesh:
    """1-D mesh over the first ``n_devices`` devices (default: all)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis_name,))


def shard_leading_axis(tree, mesh: Mesh, axis_name: str = "restart"):
    """Place every leaf of a batched pytree with its leading axis sharded
    over ``axis_name`` (replicated on the remaining dims)."""
    def put(leaf):
        spec = P(axis_name, *([None] * (jnp.ndim(leaf) - 1)))
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, tree)


def sharded_fit_restarts(
    loss_fn: Callable,
    params_batch,
    mesh: Mesh,
    steps: int = 100,
    lr: float = 1e-2,
    axis_name: str = "restart",
    loss_args: Optional[tuple] = None,
    aux0=None,
):
    """`train/fit.py:fit_restarts` with the restart axis sharded across the
    mesh: each device trains its own restarts; the best-restart argmax is a
    cross-device reduction XLA inserts automatically.

    ``loss_args`` enables fit_restarts' cached-program path (stable-identity
    ``loss_fn`` called as ``loss_fn(p, *loss_args)``).

    ``aux0``: per-restart aux carry batch (leading axis = restarts) for
    aux-threading losses, e.g. the HOGP tracked-spectrum eigenbasis —
    sharded over the mesh like the params (each device tracks its own
    restarts' eigenbases; the refresh schedule keys on the shared step
    counter, so the `cond` branch stays uniform across devices).

    Returns (best_params (replicated), losses (restarts, steps)).
    """
    from fidelityfusion_tpu.train.fit import fit_restarts

    params_batch = shard_leading_axis(params_batch, mesh, axis_name)
    if aux0 is not None:
        aux0 = shard_leading_axis(aux0, mesh, axis_name)
    with mesh:
        best, result = fit_restarts(
            loss_fn, params_batch, steps=steps, lr=lr, loss_args=loss_args,
            aux0=aux0,
        )
    return best, result


def sharded_acq_argmax(
    acq_fn: Callable[[jnp.ndarray], jnp.ndarray],
    candidates: jnp.ndarray,
    mesh: Mesh,
    axis_name: str = "restart",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Score a candidate batch with its rows sharded over the mesh and
    return (best_x, best_value) — replacing the reference's python argmax
    loops (`DMF_acq.py:244-262`) with one sharded program."""
    candidates = shard_leading_axis(candidates, mesh, axis_name)

    @jax.jit
    def run(xs):
        vals = acq_fn(xs)
        best = jnp.argmax(vals)
        return xs[best], vals[best]

    with mesh:
        return run(candidates)


def sharded_posterior_mean(
    kernel_apply: Callable,
    kernel_params,
    x_train: jnp.ndarray,
    alpha: jnp.ndarray,
    x_test: jnp.ndarray,
    mesh: Mesh,
    axis_name: str = "restart",
) -> jnp.ndarray:
    """Row-sharded posterior mean: K_*(x_test, x_train) @ alpha with the
    test rows sharded — each device builds only its Gram block (the
    large-m prediction path: O(m n d) Gram + O(m n) matmul, zero
    collectives)."""
    x_test = shard_leading_axis(x_test, mesh, axis_name)

    @jax.jit
    def run(xt):
        K_s = kernel_apply(kernel_params, xt, x_train)
        return K_s @ alpha

    with mesh:
        return run(x_test)
