"""n-axis sharded Kronecker/HOGP NLML (`parallel/kron_nsharded.py`):
distributed mode-products + tracked-spectrum training over the virtual
8-device mesh.

Verdict-defined done-bar (round 5): value AND grads of the sharded
tracked path match the unsharded `models/hogp.py:nll_tracked` on the
virtual mesh — on the refresh step (replicated eigh of the gathered
Gram) and on tracked steps (distributed Jacobi refinement).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fidelityfusion_tpu.models.hogp import HOGP
from fidelityfusion_tpu.ops.kernels import ARDKernel
from fidelityfusion_tpu.parallel.kron_nsharded import (
    fit_hogp_nsharded,
    hogp_nll_tracked_nsharded,
)
from fidelityfusion_tpu.parallel.nsharded import make_n_mesh


def _fixture(n, shape, d_in=2, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.random((n, d_in)) * 4, jnp.float32)
    y = jnp.asarray(rng.standard_normal((n,) + shape), jnp.float32)
    hogp = HOGP(kernel=ARDKernel(), output_shape=shape)
    params = hogp.init_params(d_in)
    return hogp, params, x, y


def _grad_rel_err(g1, g2):
    import jax.tree_util as jtu

    errs = {}
    for (path, a), (_, b) in zip(
        jtu.tree_flatten_with_path(g1)[0], jtu.tree_flatten_with_path(g2)[0]
    ):
        denom = np.abs(np.asarray(b)).max() + 1e-12
        errs[jtu.keystr(path)] = float(
            np.abs(np.asarray(a) - np.asarray(b)).max() / denom
        )
    return errs


@pytest.mark.parametrize("P", [1, 2, 8])
@pytest.mark.parametrize("step", [0.0, 1.0])
def test_sharded_tracked_matches_unsharded(P, step):
    """Refresh step (0) AND tracked step (1): value + all param grads."""
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    n, shape = 64, (4, 3)
    hogp, params, x, y = _fixture(n, shape)
    mesh = make_n_mesh(P)

    # a realistic V_prev for the tracked step: the eigenbasis of the Gram
    # at PERTURBED params (what a previous Adam step would have left)
    p2 = jax.tree_util.tree_map(lambda a: a * 1.05, params)
    K_prev = hogp.kernel.apply(p2["kernel"], x, x) + hogp.jitter * jnp.eye(n)
    _, V_prev = jnp.linalg.eigh(K_prev)
    aux = (V_prev, jnp.zeros((), jnp.float32))

    def sharded(pp):
        loss, _ = hogp_nll_tracked_nsharded(
            hogp, pp, aux, jnp.float32(step), x, y, mesh, refresh_every=64
        )
        return loss

    def unsharded(pp):
        loss, _ = hogp.nll_tracked(
            pp, aux, jnp.float32(step), x, y, refresh_every=64
        )
        return loss

    v_sh, g_sh = jax.value_and_grad(sharded)(params)
    v_ref, g_ref = jax.value_and_grad(unsharded)(params)
    assert abs(float(v_sh) - float(v_ref)) < 2e-4 * max(1.0, abs(float(v_ref))), (
        float(v_sh), float(v_ref), P, step,
    )
    errs = _grad_rel_err(g_sh, g_ref)
    assert max(errs.values()) < 5e-3, (errs, P, step)


def test_sharded_tracked_yvar():
    """Observed-noise diagonal (the non-subset GAR residual path)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    n, shape = 32, (3, 3)
    hogp, params, x, y = _fixture(n, shape, seed=1)
    y_var = jnp.asarray(
        np.random.default_rng(2).random(n) * 0.1, jnp.float32
    )
    mesh = make_n_mesh(8)
    aux = hogp.tracking_aux0(n)

    loss_sh, _ = hogp_nll_tracked_nsharded(
        hogp, params, aux, jnp.float32(0.0), x, y, mesh, y_var=y_var
    )
    loss_ref, _ = hogp.nll_tracked(
        params, aux, jnp.float32(0.0), x, y, y_var=y_var
    )
    assert abs(float(loss_sh) - float(loss_ref)) < 2e-4, (
        float(loss_sh), float(loss_ref),
    )


def test_fit_hogp_nsharded_trains():
    """One-call distributed training: losses decrease; final params match
    an unsharded pure-tracking run of the same schedule."""
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    import optax

    from fidelityfusion_tpu.train.fit import adam_scan_aux

    n, shape = 64, (4, 4)
    hogp, params, x, y = _fixture(n, shape, seed=3)
    mesh = make_n_mesh(8)
    steps = 12

    good, losses, _aux = fit_hogp_nsharded(
        hogp, params, x, y, mesh, steps=steps, lr=5e-2
    )
    losses = np.asarray(losses)
    assert np.all(np.isfinite(losses))
    assert losses[-1] < losses[0]

    def loss_ref(p, aux, step):
        return hogp.nll_tracked(
            p, aux, step, x, y, refresh_every=steps + 1
        )

    _, good_ref, losses_ref, _ = adam_scan_aux(
        loss_ref, params, hogp.tracking_aux0(n), optax.adam(5e-2), steps
    )
    np.testing.assert_allclose(
        np.asarray(losses), np.asarray(losses_ref), rtol=2e-3, atol=2e-4
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(good), jax.tree_util.tree_leaves(good_ref)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-4
        )
