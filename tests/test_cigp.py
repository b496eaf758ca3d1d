"""CIGP model tests: training recovers a sin function, observed-noise
targets, mask equivalence, and the scanned Adam fit loop."""

import numpy as np
import jax
import jax.numpy as jnp

from fidelityfusion_tpu.models.cigp import CIGP, GPBasic
from fidelityfusion_tpu.ops.kernels import ARDKernel, SquaredExponentialKernel
from fidelityfusion_tpu.ops import linalg as L
from fidelityfusion_tpu.train.fit import fit, fit_restarts, perturb_params


def make_sin_problem(n=40, seed=0):
    rng = np.random.default_rng(seed)
    x = (rng.random((n, 1)) * 6).astype(np.float32)
    y = (np.sin(x) + rng.standard_normal((n, 1)) * 0.1).astype(np.float32)
    xt = np.linspace(0, 6, 50).reshape(-1, 1).astype(np.float32)
    yt = np.sin(xt).astype(np.float32)
    return jnp.asarray(x), jnp.asarray(y), jnp.asarray(xt), jnp.asarray(yt)


def test_cigp_fit_and_predict():
    x, y, xt, yt = make_sin_problem()
    gp = CIGP(kernel=ARDKernel())
    params = gp.init_params(1)
    result = fit(lambda p: gp.nll(p, x, y), params, steps=200, lr=0.1)
    assert result.losses[-1] < result.losses[0]
    mean, cov = gp.predict(result.params, x, y, xt)
    rmse = float(jnp.sqrt(jnp.mean((mean - yt) ** 2)))
    assert rmse < 0.15, f"rmse {rmse}"
    var = np.diagonal(np.asarray(cov))
    assert np.all(var > 0)


def test_cigp_multioutput_nll_and_predict():
    x, y, xt, _ = make_sin_problem()
    y3 = jnp.concatenate([y, 2 * y, -y], axis=1)
    gp = CIGP(kernel=ARDKernel())
    params = gp.init_params(1)
    nll = gp.nll(params, x, y3)
    assert np.isfinite(float(nll))
    mean, cov = gp.predict(params, x, y3, xt)
    assert mean.shape == (50, 3)
    assert cov.shape == (50, 50)


def test_cigp_observed_noise_targets():
    """y = [mean, var] convention: rows with large known noise variance
    should be trusted less -> different NLML."""
    x, y, _, _ = make_sin_problem()
    gp = CIGP(kernel=ARDKernel())
    params = gp.init_params(1)
    base = float(gp.nll(params, x, y))
    yvar = jnp.ones((x.shape[0],)) * 0.5
    noisy = float(gp.nll(params, x, y, y_var=yvar))
    assert not np.isclose(base, noisy)


def test_cigp_masked_equals_unpadded():
    x, y, xt, _ = make_sin_problem(n=30)
    gp = CIGP(kernel=ARDKernel())
    params = gp.init_params(1)
    want_nll = float(gp.nll(params, x, y))
    mean_w, cov_w = gp.predict(params, x, y, xt)

    n_pad = 48
    xp = jnp.asarray(L.pad_rows(x, n_pad))
    yp = jnp.asarray(L.pad_rows(y, n_pad))
    mask = L.row_mask(30, n_pad)
    got_nll = float(gp.nll(params, xp, yp, mask=mask))
    np.testing.assert_allclose(got_nll, want_nll, rtol=1e-4)
    mean_g, cov_g = gp.predict(params, xp, yp, xt, mask=mask)
    np.testing.assert_allclose(np.asarray(mean_g), np.asarray(mean_w), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(cov_g), np.asarray(cov_w), rtol=1e-3, atol=1e-4)


def test_gp_basic_fit():
    x, y, xt, yt = make_sin_problem()
    gp = GPBasic(kernel=ARDKernel())
    params = gp.init_params(1)
    result = fit(lambda p: gp.nll(p, x, y), params, steps=200, lr=0.1)
    mean, _ = gp.predict(result.params, x, y, xt)
    rmse = float(jnp.sqrt(jnp.mean((mean - yt) ** 2)))
    assert rmse < 0.15


def test_nan_guard_rolls_back():
    """A loss that becomes NaN must not poison the parameters."""
    calls = {"n": 0}

    def loss_fn(p):
        # NaN on every step via 0/0 when w crosses: emulate by sqrt(w)
        return jnp.sqrt(p["w"]).sum()  # NaN once w < 0

    params = {"w": jnp.asarray([0.01], jnp.float32)}
    result = fit(loss_fn, params, steps=50, lr=0.1)
    assert np.all(np.isfinite(np.asarray(result.params["w"])))


def test_fit_restarts_picks_best():
    x, y, _, _ = make_sin_problem()
    gp = CIGP(kernel=SquaredExponentialKernel())
    params = gp.init_params(1)
    batch = perturb_params(jax.random.PRNGKey(0), params, n=4)
    best, result = fit_restarts(lambda p: gp.nll(p, x, y), batch, steps=100, lr=0.05)
    finals = np.asarray(result.losses[:, -1])
    best_nll = float(gp.nll(best, x, y))
    np.testing.assert_allclose(best_nll, np.nanmin(finals), rtol=1e-3)


def test_x64_factor_escape_hatch():
    """The high-precision path (round 5): the BASELINE NaN case (SE Gram,
    noise 1e-4 — cond ~1.3e6 scaled down to n=256 here) NaNs every f32
    path AND the shipped f32 torch reference (_LinAlgError — measured in
    scripts/conditioning_study.py), while CIGP(x64_factor=True) matches
    the f64 closed form and trains finite."""
    import scipy.linalg as sla

    from fidelityfusion_tpu.ops.kernels import SquaredExponentialKernel

    rng = np.random.default_rng(0)
    n = 256
    x = (rng.random((n, 1)) * 20).astype(np.float32)
    y = np.sin(x).astype(np.float32)
    noise = 1e-5  # cond ~ 4e6 at n=256: beyond f32

    # f64 ground truth
    x64 = x.astype(np.float64)
    K = np.exp(-0.5 * (x64 - x64.T) ** 2)
    Sigma = K + noise * np.eye(n)
    L = np.linalg.cholesky(Sigma)
    alpha = sla.cho_solve((L, True), y.astype(np.float64))
    nll_ref = float(
        0.5 * (y.astype(np.float64) * alpha).sum()
        + np.log(np.diag(L)).sum()
        + 0.5 * n * np.log(2 * np.pi)
    )

    def params(gp):
        p = gp.init_params(1)
        p["kernel"] = {
            "length_scale": jnp.zeros((1,), jnp.float32),
            "signal_variance": jnp.zeros((1,), jnp.float32),
        }
        p["log_beta"] = jnp.asarray([-np.log(noise)], jnp.float32)
        return p

    gp32 = CIGP(kernel=SquaredExponentialKernel(), jitter=0.0,
                min_noise=0.0, se_analytic_nll=False, hybrid_nll=False)
    v32 = float(gp32.nll(params(gp32), jnp.asarray(x), jnp.asarray(y)))
    assert not np.isfinite(v32), "fixture no longer ill-conditioned"

    gp64 = CIGP(kernel=SquaredExponentialKernel(), jitter=0.0,
                min_noise=0.0, x64_factor=True)
    p = params(gp64)
    v64, g = jax.value_and_grad(
        lambda pp: gp64.nll(pp, jnp.asarray(x), jnp.asarray(y))
    )(p)
    assert abs(float(v64) - nll_ref) < 1e-2 * abs(nll_ref), (
        float(v64), nll_ref,
    )
    assert all(
        np.all(np.isfinite(np.asarray(leaf)))
        for leaf in jax.tree_util.tree_leaves(g)
    )

    # trains finite through the scan (the custom-VJP x64 island must
    # survive jit/scan transposition — the enable_x64-scope bug class)
    import optax

    from fidelityfusion_tpu.train.fit import adam_scan

    _, good, losses = adam_scan(
        lambda pp: gp64.nll(pp, jnp.asarray(x), jnp.asarray(y)),
        p, optax.adam(1e-2), 10,
    )
    losses = np.asarray(losses)
    assert np.all(np.isfinite(losses)) and losses[-1] <= losses[0]

    # x64 posterior agrees with the f64 closed form
    xt = np.linspace(0, 20, 16).reshape(-1, 1).astype(np.float32)
    m64, var64 = gp64.predict_diag(p, jnp.asarray(x), jnp.asarray(y),
                                   jnp.asarray(xt))
    Ks = np.exp(-0.5 * (x64 - xt.astype(np.float64).T) ** 2)
    m_ref = Ks.T @ alpha
    np.testing.assert_allclose(np.asarray(m64), m_ref, atol=1e-3)
    assert np.all(np.asarray(var64) > 0)
