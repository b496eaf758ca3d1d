"""Acquisition maximization: vmapped multi-start Adam + random-candidate argmax.

TPU-native re-design of `Bayesian_optimization/acq.py:10-115`
(`optimize_acqf` / `find_next_batch`) and
`MF_BayesianOptimization/Discrete/DMF_acq.py:226-262` (`optimize_acq_mf`):
the whole multi-start ascent runs as ONE jitted `lax.scan` over Adam steps
with the candidate batch vmapped (and shardable across devices via
`parallel/`), instead of the reference's python loop over torch steps.
Candidates are clipped to the search bounds each step (the reference
optimizes unconstrained, drifting out of bounds — not replicated).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax


def _ascend(acq_fn, x_init, lo, hi, acq_args, steps, lr):
    """Multi-start Adam ascent body (one compiled scan)."""
    opt = optax.adam(lr)

    def score(x):
        return acq_fn(x, *acq_args)

    def neg_sum(x):
        return -jnp.sum(score(x))

    def step(carry, _):
        x, opt_state = carry
        val, g = jax.value_and_grad(neg_sum)(x)
        updates, opt_state = opt.update(g, opt_state, x)
        x = optax.apply_updates(x, updates)
        x = jnp.clip(x, lo, hi)
        return (x, opt_state), val

    (x_fin, _), _ = jax.lax.scan(
        step, (x_init, opt.init(x_init)), None, length=steps
    )
    vals = score(x_fin)
    best = jnp.argmax(vals)
    return x_fin[best], vals[best]


@partial(jax.jit, static_argnames=("acq_fn", "steps", "lr"))
def _ascend_cached(acq_fn, x_init, lo, hi, acq_args, steps, lr):
    return _ascend(acq_fn, x_init, lo, hi, acq_args, steps, lr)


def optimize_acqf(
    acq_fn: Callable[..., jnp.ndarray],
    bounds: jnp.ndarray,
    key: jax.Array,
    raw_samples: int = 30,
    steps: int = 30,
    lr: float = 0.1,
    acq_args: Optional[tuple] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Maximize ``acq_fn`` (batch (n, d) -> (n,)) over the box ``bounds``
    ((d, 2) array of [lo, hi]); returns (best_x (d,), best_value).

    Multi-start: ``raw_samples`` uniform starts ascend together; winner by
    final acquisition value (the reference returns the whole batch after
    descending the *summed* objective, `acq.py:39-70` — the per-candidate
    argmax here is the intended multi-start semantics).

    ``acq_args``: when given, ``acq_fn`` is treated as a stable-identity
    static callable invoked as ``acq_fn(x, *acq_args)`` and the whole
    ascent program is cached across calls (jit static arg) — pass a
    frozen-dataclass score (e.g. `bo/mf_acq.py:MFAcqScore` over an
    `ARPosterior`) so BO iterations reuse one compiled optimizer.
    """
    bounds = jnp.asarray(bounds, jnp.float32)
    d = bounds.shape[0]
    lo, hi = bounds[:, 0], bounds[:, 1]
    x0 = jax.random.uniform(key, (raw_samples, d)) * (hi - lo) + lo
    if acq_args is not None:
        return _ascend_cached(
            acq_fn, x0, lo, hi, tuple(acq_args), int(steps), float(lr)
        )
    run = jax.jit(
        lambda x_init: _ascend(
            lambda x, *a: acq_fn(x), x_init, lo, hi, (), steps, lr
        )
    )
    return run(x0)


def find_next_batch(
    acq_fn: Callable[[jnp.ndarray], jnp.ndarray],
    bounds: jnp.ndarray,
    key: jax.Array,
    batch_size: int = 1,
    n_samples: int = 1000,
) -> jnp.ndarray:
    """Random-candidate argmax (`acq.py:81-115`): sample ``n_samples``
    uniform points per batch slot, keep the acquisition argmax of each."""
    bounds = jnp.asarray(bounds, jnp.float32)
    d = bounds.shape[0]
    lo, hi = bounds[:, 0], bounds[:, 1]

    def pick(k):
        xs = jax.random.uniform(k, (n_samples, d)) * (hi - lo) + lo
        vals = acq_fn(xs)
        return xs[jnp.argmax(vals)]

    keys = jax.random.split(key, batch_size)
    return jax.vmap(pick)(keys)
