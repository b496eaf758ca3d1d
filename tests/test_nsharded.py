"""n-axis sharded NLML (`parallel/nsharded.py`): distributed Gram +
blocked Cholesky + psum-reduced NLML over the virtual 8-device mesh.

The verdict-defined done-bar: value AND grads of the sharded path match
the unsharded path at n=2048 on the 8-device CPU mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fidelityfusion_tpu.models.cigp import CIGP
from fidelityfusion_tpu.ops.kernels import ARDKernel, SquaredExponentialKernel
from fidelityfusion_tpu.parallel.nsharded import (
    cigp_nll_nsharded,
    make_n_mesh,
)


def _fixture(n, d_in, d_out=1, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.random((n, d_in)) * 4, jnp.float32)
    y = jnp.asarray(
        np.sin(np.asarray(x).sum(1, keepdims=True))
        * np.linspace(1.0, 2.0, d_out)[None, :]
        + 0.1 * rng.standard_normal((n, d_out)),
        jnp.float32,
    )
    return x, y


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


@pytest.mark.parametrize("n,d_in,d_out", [(2048, 2, 1), (512, 3, 2)])
def test_nsharded_matches_unsharded_value_and_grad(n, d_in, d_out):
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    x, y = _fixture(n, d_in, d_out)
    gp = CIGP(kernel=ARDKernel(), se_analytic_nll=False, hybrid_nll=False)
    p = gp.init_params(d_in)
    mesh = make_n_mesh(8)

    v_sh = float(cigp_nll_nsharded(gp, p, x, y, mesh))
    v_ref = float(gp.nll(p, x, y))
    assert abs(v_sh - v_ref) < 1e-3 * max(1.0, abs(v_ref)), (v_sh, v_ref)

    g_sh = jax.grad(lambda pp: cigp_nll_nsharded(gp, pp, x, y, mesh))(p)
    g_ref = jax.grad(lambda pp: gp.nll(pp, x, y))(p)
    errs = _grad_rel_err(g_sh, g_ref)
    assert max(errs.values()) < 2e-3, errs


def test_nsharded_yvar_and_se_kernel():
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    n, d_in = 256, 2
    x, y = _fixture(n, d_in)
    rng = np.random.default_rng(1)
    y_var = jnp.asarray(rng.random((n,)) * 0.05, jnp.float32)
    gp = CIGP(kernel=SquaredExponentialKernel(), se_analytic_nll=False,
              hybrid_nll=False)
    p = gp.init_params(d_in)
    mesh = make_n_mesh(8)
    v_sh = float(cigp_nll_nsharded(gp, p, x, y, mesh, y_var=y_var))
    v_ref = float(gp.nll(p, x, y, y_var=y_var))
    assert abs(v_sh - v_ref) < 1e-3 * max(1.0, abs(v_ref))
    g_sh = jax.grad(
        lambda pp: cigp_nll_nsharded(gp, pp, x, y, mesh, y_var=y_var))(p)
    g_ref = jax.grad(lambda pp: gp.nll(pp, x, y, y_var=y_var))(p)
    errs = _grad_rel_err(g_sh, g_ref)
    assert max(errs.values()) < 2e-3, errs


def test_nsharded_pads_arbitrary_n():
    """Arbitrary n (round 5): rows pad to a multiple of P with identity
    masking — value/grad must equal the unsharded NLML on the REAL rows
    (the ValueError of round 4 is gone)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    x, y = _fixture(130, 2)
    gp = CIGP(kernel=ARDKernel(), se_analytic_nll=False, hybrid_nll=False)
    p = gp.init_params(2)
    mesh = make_n_mesh(8)
    v_sh = float(cigp_nll_nsharded(gp, p, x, y, mesh))
    v_ref = float(gp.nll(p, x, y))
    assert abs(v_sh - v_ref) < 1e-3 * max(1.0, abs(v_ref)), (v_sh, v_ref)
    g_sh = jax.grad(lambda pp: cigp_nll_nsharded(gp, pp, x, y, mesh))(p)
    g_ref = jax.grad(lambda pp: gp.nll(pp, x, y))(p)
    errs = _grad_rel_err(g_sh, g_ref)
    assert max(errs.values()) < 2e-3, errs


def test_nsharded_padded_posterior():
    """Padded serving: mean/var at arbitrary n match predict_diag."""
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    from fidelityfusion_tpu.parallel.nsharded import cigp_posterior_nsharded

    x, y = _fixture(75, 2, seed=5)
    xt = jnp.asarray(np.random.default_rng(6).random((17, 2)) * 4,
                     jnp.float32)
    gp = CIGP(kernel=ARDKernel(), se_analytic_nll=False, hybrid_nll=False)
    p = gp.init_params(2)
    mesh = make_n_mesh(8)
    m_sh, v_sh = cigp_posterior_nsharded(gp, p, x, y, xt, mesh)
    m_ref, v_ref = gp.predict_diag(p, x, y, xt)
    np.testing.assert_allclose(np.asarray(m_sh), np.asarray(m_ref),
                               rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(v_sh), np.asarray(v_ref),
                               rtol=2e-3, atol=2e-4)


def test_nsharded_matches_shipping_dispatch():
    """Parity against the SHIPPING CIGP() default dispatch (se-analytic /
    hybrid NLML) — not just the vanilla trsm path (VERDICT r4 weak #1e).
    n >= hybrid_min_n so the default dispatch actually takes the
    se-analytic route."""
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    x, y = _fixture(520, 1)
    gp_ship = CIGP(kernel=SquaredExponentialKernel())  # shipping defaults
    p = gp_ship.init_params(1)
    mesh = make_n_mesh(8)
    v_sh = float(cigp_nll_nsharded(gp_ship, p, x, y, mesh))
    v_ref = float(gp_ship.nll(p, x, y))
    assert abs(v_sh - v_ref) < 2e-3 * max(1.0, abs(v_ref)), (v_sh, v_ref)
    g_sh = jax.grad(lambda pp: cigp_nll_nsharded(gp_ship, pp, x, y, mesh))(p)
    g_ref = jax.grad(lambda pp: gp_ship.nll(pp, x, y))(p)
    errs = _grad_rel_err(g_sh, g_ref)
    assert max(errs.values()) < 5e-3, errs


def test_restarts_nsharded_2d_mesh():
    """Restarts x n on a 2-D (r, n) mesh (VERDICT r4 weak #1b): the
    per-restart NLML vector matches per-restart unsharded NLMLs, and
    `fit_restarts_nsharded` selects a verified best restart whose loss
    matches the equivalent unsharded restart fit."""
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    from fidelityfusion_tpu.parallel.nsharded import (
        fit_restarts_nsharded,
        make_rn_mesh,
        restarts_nll_nsharded,
    )
    from fidelityfusion_tpu.train.fit import perturb_params, stack_params

    n, d_in, R = 96, 2, 4
    x, y = _fixture(n, d_in, seed=7)
    gp = CIGP(kernel=ARDKernel(), se_analytic_nll=False, hybrid_nll=False)
    p0 = gp.init_params(d_in)
    batch = perturb_params(jax.random.PRNGKey(0), p0, n=R)
    mesh = make_rn_mesh(2, 4)

    losses = np.asarray(
        restarts_nll_nsharded(gp, batch, x, y, mesh, r_axis="r")
    )
    refs = np.asarray([
        float(gp.nll(jax.tree_util.tree_map(lambda a: a[i], batch), x, y))
        for i in range(R)
    ])
    np.testing.assert_allclose(losses, refs, rtol=1e-3, atol=1e-4)

    best, final = fit_restarts_nsharded(
        gp, batch, x, y, mesh, steps=10, lr=5e-2, r_axis="r"
    )
    final = np.asarray(final)
    assert np.all(np.isfinite(final))
    v_best = float(gp.nll(best, x, y))
    assert abs(v_best - final.min()) < 1e-2 * max(1.0, abs(v_best))


def test_restarts_nsharded_1d_mesh_unsharded_r():
    """r_axis=None: the restart batch is vmapped per-device over a pure
    n mesh — the dispatch the cascade trainers use when no 2-D mesh is
    available."""
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    from fidelityfusion_tpu.parallel.nsharded import restarts_nll_nsharded
    from fidelityfusion_tpu.train.fit import perturb_params

    n, d_in, R = 64, 2, 3
    x, y = _fixture(n, d_in, seed=8)
    gp = CIGP(kernel=ARDKernel(), se_analytic_nll=False, hybrid_nll=False)
    batch = perturb_params(jax.random.PRNGKey(1), gp.init_params(d_in), n=R)
    mesh = make_n_mesh(8)
    losses = np.asarray(restarts_nll_nsharded(gp, batch, x, y, mesh))
    refs = np.asarray([
        float(gp.nll(jax.tree_util.tree_map(lambda a: a[i], batch), x, y))
        for i in range(R)
    ])
    np.testing.assert_allclose(losses, refs, rtol=1e-3, atol=1e-4)


def test_nsharded_trains():
    """A few Adam steps through the sharded loss reduce the NLML and keep
    parity with unsharded steps (same trajectory within f32 noise)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    import optax

    n, d_in = 256, 2
    x, y = _fixture(n, d_in, seed=3)
    gp = CIGP(kernel=ARDKernel(), se_analytic_nll=False, hybrid_nll=False)
    mesh = make_n_mesh(8)

    def run(loss_fn, steps=8):
        p = gp.init_params(d_in)
        opt = optax.adam(5e-2)
        s = opt.init(p)
        vals = []
        vg = jax.value_and_grad(loss_fn)
        for _ in range(steps):
            v, g = vg(p)
            u, s = opt.update(g, s, p)
            p = optax.apply_updates(p, u)
            vals.append(float(v))
        return vals

    vals_sh = run(lambda pp: cigp_nll_nsharded(gp, pp, x, y, mesh))
    vals_ref = run(lambda pp: gp.nll(pp, x, y))
    assert vals_sh[-1] < vals_sh[0]
    np.testing.assert_allclose(vals_sh, vals_ref, rtol=1e-3)


def test_fit_nsharded_matches_single_device_fit():
    """`fit_nsharded` (adam_scan over the sharded NLML on the 8-device
    mesh) reaches the same loss trajectory as the unsharded fit."""
    import optax

    from fidelityfusion_tpu.models.cigp import CIGP
    from fidelityfusion_tpu.ops.kernels import ARDKernel
    from fidelityfusion_tpu.parallel.nsharded import fit_nsharded, make_n_mesh
    from fidelityfusion_tpu.train.fit import adam_scan

    n, d_in = 256, 2
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.random((n, d_in)) * 3, jnp.float32)
    y = jnp.asarray(np.sin(np.asarray(x).sum(1, keepdims=True)), jnp.float32)
    gp = CIGP(kernel=ARDKernel(), se_analytic_nll=False, hybrid_nll=False)
    p0 = gp.init_params(d_in)

    mesh = make_n_mesh(8)
    good_sh, losses_sh = fit_nsharded(gp, p0, x, y, mesh, steps=20, lr=5e-2)
    _, good_ref, losses_ref = adam_scan(
        lambda pp: gp.nll(pp, x, y), p0, optax.adam(5e-2), 20)

    np.testing.assert_allclose(np.asarray(losses_sh),
                               np.asarray(losses_ref), rtol=2e-3)
    assert float(losses_sh[-1]) < float(losses_sh[0])


def test_posterior_nsharded_matches_predict_diag():
    """`cigp_posterior_nsharded` (serving half of the n-axis story)
    matches the single-device `gp.predict_diag` to f32 roundoff on the
    8-device mesh, including the noise term and y_var handling."""
    from fidelityfusion_tpu.models.cigp import CIGP
    from fidelityfusion_tpu.ops.kernels import ARDKernel
    from fidelityfusion_tpu.parallel.nsharded import (
        cigp_posterior_nsharded, make_n_mesh,
    )

    n, d_in, m = 256, 2, 17
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.random((n, d_in)) * 3, jnp.float32)
    y = jnp.asarray(np.sin(np.asarray(x).sum(1, keepdims=True)), jnp.float32)
    xt = jnp.asarray(rng.random((m, d_in)) * 3, jnp.float32)
    gp = CIGP(kernel=ARDKernel(), se_analytic_nll=False, hybrid_nll=False)
    p = gp.init_params(d_in)

    mean_ref, var_ref = gp.predict_diag(p, x, y, xt)
    for P_ in (1, 2, 8):
        mesh = make_n_mesh(P_)
        mean_sh, var_sh = cigp_posterior_nsharded(gp, p, x, y, xt, mesh)
        np.testing.assert_allclose(np.asarray(mean_sh),
                                   np.asarray(mean_ref), atol=2e-4)
        np.testing.assert_allclose(np.asarray(var_sh),
                                   np.asarray(var_ref),
                                   rtol=2e-3, atol=2e-5)
