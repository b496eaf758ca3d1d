"""HOGP / GAR / CIGAR tests on generated multi-fidelity Poisson field data
(the reference's demo data is regenerated — SURVEY.md §2.7)."""

import numpy as np
import jax.numpy as jnp
import pytest

from fidelityfusion_tpu.data.pde import generate_poisson_mf_dataset
from fidelityfusion_tpu.models.cigar import CIGAR, train_CIGAR
from fidelityfusion_tpu.models.coupling import TensorLinear, interp_identity
from fidelityfusion_tpu.models.data_manager import MultiFidelityDataManager
from fidelityfusion_tpu.models.gar import GAR, train_GAR
from fidelityfusion_tpu.models.hogp import HOGP
from fidelityfusion_tpu.ops.kernels import ARDKernel
from fidelityfusion_tpu.ops.kron import multi_mode_dot, rank1_tucker
from fidelityfusion_tpu.train.fit import fit


@pytest.fixture(scope="module")
def poisson_data():
    x, ys = generate_poisson_mf_dataset(
        n_samples=48, resolutions=(6, 10, 14), d_in=4, seed=3
    )
    return x, ys


def normalize(a):
    return (a - a.mean()) / (a.std() + 1e-10), a.mean(), a.std()


def test_hogp_nll_matches_dense():
    """Kronecker NLML must equal the dense MVN NLML (per-element
    normalized) on a small problem."""
    rng = np.random.default_rng(0)
    n, d1, d2 = 5, 3, 4
    x = jnp.asarray(rng.random((n, 2)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((n, d1, d2)), jnp.float32)
    hogp = HOGP(kernel=ARDKernel(), output_shape=(d1, d2), jitter=0.0)
    params = hogp.init_params(2)
    loss, state = hogp.nll_with_state(params, x, y)

    kp = params["kernel"]
    K0 = np.asarray(hogp.kernel.apply(kp, x, x), np.float64)
    K1 = np.asarray(hogp.kernel.apply(kp, hogp.grids()[0], hogp.grids()[0]), np.float64)
    K2 = np.asarray(hogp.kernel.apply(kp, hogp.grids()[1], hogp.grids()[1]), np.float64)
    Sigma = np.kron(np.kron(K0, K1), K2) + float(hogp.noise(params)) * np.eye(n * d1 * d2)
    yv = np.asarray(y, np.float64).ravel()
    sign, logdet = np.linalg.slogdet(Sigma)
    dense_nll = 0.5 * (
        len(yv) * np.log(2 * np.pi) + logdet + yv @ np.linalg.solve(Sigma, yv)
    )
    np.testing.assert_allclose(float(loss), dense_nll / len(yv), rtol=1e-3)


def test_hogp_predict_matches_dense():
    """HOGP posterior mean/var must match the dense Kronecker GP posterior."""
    rng = np.random.default_rng(1)
    n, m, d1, d2 = 6, 3, 3, 2
    x = jnp.asarray(rng.random((n, 2)), jnp.float32)
    xt = jnp.asarray(rng.random((m, 2)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((n, d1, d2)), jnp.float32)
    hogp = HOGP(kernel=ARDKernel(), output_shape=(d1, d2), jitter=0.0)
    params = hogp.init_params(2)
    _, state = hogp.nll_with_state(params, x, y)
    mean, var = hogp.predict(params, state, x, xt)

    kp = params["kernel"]
    K0 = np.asarray(hogp.kernel.apply(kp, x, x), np.float64)
    Ks0 = np.asarray(hogp.kernel.apply(kp, xt, x), np.float64)
    Kss0 = np.asarray(hogp.kernel.apply(kp, xt, xt), np.float64)
    K1 = np.asarray(hogp.kernel.apply(kp, hogp.grids()[0], hogp.grids()[0]), np.float64)
    K2 = np.asarray(hogp.kernel.apply(kp, hogp.grids()[1], hogp.grids()[1]), np.float64)
    noise = float(hogp.noise(params))
    D = d1 * d2
    Sigma = np.kron(np.kron(K0, K1), K2) + noise * np.eye(n * D)
    Kstar = np.kron(np.kron(Ks0, K1), K2)  # (m*D, n*D)
    Kss = np.kron(np.kron(Kss0, K1), K2)
    yv = np.asarray(y, np.float64).ravel()
    alpha = np.linalg.solve(Sigma, yv)
    mean_dense = (Kstar @ alpha).reshape(m, d1, d2)
    cov_dense = Kss - Kstar @ np.linalg.solve(Sigma, Kstar.T)
    var_dense = np.diagonal(cov_dense).reshape(m, d1, d2) + noise
    np.testing.assert_allclose(np.asarray(mean), mean_dense, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(var), var_dense, rtol=1e-2, atol=1e-3)


def test_hogp_fit_poisson(poisson_data):
    x, ys = poisson_data
    y = ys[1]
    yn, _, _ = normalize(y)
    xn, _, _ = normalize(x)
    hogp = HOGP(kernel=ARDKernel(), output_shape=y.shape[1:])
    params = hogp.init_params(x.shape[1])
    xj, yj = jnp.asarray(xn[:40], jnp.float32), jnp.asarray(yn[:40], jnp.float32)
    res = fit(lambda p: hogp.nll(p, xj, yj), params, steps=100, lr=5e-2)
    assert res.losses[-1] < res.losses[0]
    _, state = hogp.nll_with_state(res.params, xj, yj)
    mean, var = hogp.predict(res.params, state, xj, jnp.asarray(xn[40:], jnp.float32))
    rel = np.linalg.norm(np.asarray(mean) - yn[40:]) / np.linalg.norm(yn[40:])
    assert rel < 0.5, f"HOGP relative error {rel}"
    assert np.all(np.asarray(var) > 0)


def test_tensor_linear_accumulates_all_modes():
    """The reference bug applied only the last mode map; ours applies all."""
    tl = TensorLinear((3, 4), (3, 4))
    p = tl.init_params()
    p["maps"][0] = 2.0 * jnp.eye(3)
    p["maps"][1] = 3.0 * jnp.eye(4)
    x = jnp.ones((2, 3, 4))
    out = tl.apply(p, x)
    np.testing.assert_allclose(np.asarray(out), 6.0 * np.ones((2, 3, 4)), rtol=1e-6)


def test_interp_identity_interpolates():
    M = interp_identity(4, 7)
    sig = np.linspace(0, 1, 4)
    lifted = sig @ M
    assert lifted.shape == (7,)
    np.testing.assert_allclose(lifted[0], sig[0], atol=1e-6)
    np.testing.assert_allclose(lifted[-1], sig[-1], atol=1e-6)
    assert np.all(np.diff(lifted) > 0)


def _mf_manager(x, ys, n_per_fid=(40, 32, 24)):
    initial = []
    for i, (y, n) in enumerate(zip(ys, n_per_fid)):
        initial.append(
            {
                "raw_fidelity_name": str(i),
                "fidelity_indicator": i,
                "X": x[:n],
                "Y": y[:n],
            }
        )
    return MultiFidelityDataManager(initial)


def test_gar_non_aligned(poisson_data):
    """GAR on non-aligned multi-fidelity fields (different resolution per
    fidelity) — the headline GAR capability (`GAR.py:129-190`)."""
    x, ys = poisson_data
    dm = _mf_manager(x, ys)
    shapes = [y.shape[1:] for y in ys]
    model = GAR(3, [ARDKernel() for _ in range(3)], shapes, input_dim=x.shape[1])
    train_GAR(model, dm, max_iter=60, lr_init=5e-2)
    mean, var = model.forward(dm, jnp.asarray(x[40:], jnp.float32))
    mean_dn = np.asarray(mean)
    truth = ys[2][40:]
    rel = np.linalg.norm(mean_dn - truth) / np.linalg.norm(truth)
    assert rel < 0.5, f"GAR relative error {rel}"


def test_cigar_matches_protocol(poisson_data):
    x, ys = poisson_data
    ys_flat = [y.reshape(len(y), -1) for y in ys]
    dm = _mf_manager(x, ys_flat)
    shapes = [y.shape[1:] for y in ys]
    model = CIGAR(3, [ARDKernel() for _ in range(3)], shapes, input_dim=x.shape[1])
    train_CIGAR(model, dm, max_iter=60, lr_init=5e-2)
    mean, var = model.forward(dm, jnp.asarray(x[40:], jnp.float32))
    mean_dn = np.asarray(mean)
    truth = ys_flat[2][40:]
    rel = np.linalg.norm(mean_dn - truth) / np.linalg.norm(truth)
    assert rel < 0.5, f"CIGAR relative error {rel}"
    assert np.all(np.asarray(var) > 0)


def test_hogp_learnable_grid_map():
    """Learnable grid/map flags add trainable leaves and keep the NLML
    differentiable through them (`hogp_simple.py:22-43` options)."""
    import jax

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.random((8, 2)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((8, 4, 3)), jnp.float32)
    hogp = HOGP(kernel=ARDKernel(), output_shape=(4, 3),
                learnable_grid=True, learnable_map=True)
    p = hogp.init_params(2)
    assert "grids" in p and "maps" in p
    g = jax.grad(lambda pp: hogp.nll(pp, x, y))(p)
    assert any(float(jnp.max(jnp.abs(leaf))) > 0 for leaf in g["grids"])
    assert any(float(jnp.max(jnp.abs(leaf))) > 0 for leaf in g["maps"])


def test_gar_nonsubset(poisson_data):
    """GAR with non-subset fidelity data exercises the imputation path
    (`get_nonsubset_fill_data` -> HOGP y_var diagonal)."""
    x, ys = poisson_data
    # different x per fidelity -> non-subset
    dm = MultiFidelityDataManager(
        [
            {"raw_fidelity_name": "0", "fidelity_indicator": 0,
             "X": x[:40], "Y": ys[0][:40]},
            {"raw_fidelity_name": "1", "fidelity_indicator": 1,
             "X": np.concatenate([x[8:32], x[44:48]]), 
             "Y": np.concatenate([ys[1][8:32], ys[1][44:48]])},
        ]
    )
    shapes = [y.shape[1:] for y in ys[:2]]
    model = GAR(2, [ARDKernel() for _ in range(2)], shapes,
                if_nonsubset=True, input_dim=x.shape[1])
    train_GAR(model, dm, max_iter=40, lr_init=5e-2)
    mean, var = model.forward(dm, jnp.asarray(x[40:44], jnp.float32))
    assert np.all(np.isfinite(np.asarray(mean)))
    assert np.all(np.asarray(var) > 0)


def test_kron_nlml_custom_vjp_matches_finite_differences():
    """The custom VJP of the Kronecker NLML (`ops/kron.py:kron_nlml`) —
    closed-form mode-Gram gradients reusing the forward eigenpairs — must
    match central finite differences in f64 (the eigh-autodiff path is NOT
    a valid reference: near-degenerate mode eigenvalues make its F-matrix
    1/(lam_i - lam_j) terms blow up in f32, see the accuracy test below)."""
    import jax

    from fidelityfusion_tpu.ops.kron import kron_nlml

    jax.config.update("jax_enable_x64", True)
    try:
        rng = np.random.default_rng(0)
        n, d1 = 7, 4

        def psd(m):
            a = rng.standard_normal((m, m))
            return jnp.asarray(a @ a.T / m + np.eye(m))

        K0, K1 = psd(n), psd(d1)
        y = jnp.asarray(rng.standard_normal((n, d1)))
        noise = jnp.asarray(0.3)

        def f(K0, K1, noise):
            return kron_nlml((K0, K1), y, noise)

        g0, g1, gn = jax.grad(f, argnums=(0, 1, 2))(K0, K1, noise)
        eps = 1e-6
        for (g, K, arg) in ((g0, K0, 0), (g1, K1, 1)):
            m = K.shape[0]
            for i in range(m):
                for j in range(m):
                    E = jnp.zeros((m, m)).at[i, j].set(eps)
                    args_p = [K0, K1, noise]
                    args_m = [K0, K1, noise]
                    args_p[arg] = args_p[arg] + E
                    args_m[arg] = args_m[arg] - E
                    fd = (float(f(*args_p)) - float(f(*args_m))) / (2 * eps)
                    assert abs(float(g[i, j]) - fd) < 1e-6, (arg, i, j)
        fdn = (float(f(K0, K1, noise + eps)) - float(f(K0, K1, noise - eps))) / (
            2 * eps
        )
        assert abs(float(gn) - fdn) < 1e-6
        # gradient w.r.t. y too
        gy = jax.grad(lambda yy: kron_nlml((K0, K1), yy, noise))(y)
        E = jnp.zeros_like(y).at[2, 1].set(eps)
        fdy = (
            float(kron_nlml((K0, K1), y + E, noise))
            - float(kron_nlml((K0, K1), y - E, noise))
        ) / (2 * eps)
        assert abs(float(gy[2, 1]) - fdy) < 1e-6
    finally:
        jax.config.update("jax_enable_x64", False)


def test_hogp_custom_vjp_more_accurate_than_eigh_autodiff_in_f32():
    """Round-3 correctness finding: differentiating the HOGP NLML through
    `jnp.linalg.eigh` in f32 corrupts kernel-parameter gradients (up to
    ~280% relative error on this fixture — the mode Grams over integer
    grids have near-degenerate eigenvalues, and eigh's backward divides by
    their gaps).  The custom VJP never forms eigenvector derivatives and
    stays at ~1e-3.  `HOGP.nll` (the training path) must route through the
    custom VJP."""
    import jax
    from jax.flatten_util import ravel_pytree

    from fidelityfusion_tpu.ops.kernels import SquaredExponentialKernel

    rng = np.random.default_rng(0)
    n, shape = 24, (5, 7)
    x64 = np.asarray(rng.random((n, 2)))
    y64 = np.asarray(rng.standard_normal((n,) + shape))
    hogp = HOGP(kernel=SquaredExponentialKernel(), output_shape=shape)

    jax.config.update("jax_enable_x64", True)
    try:
        p64 = jax.tree.map(
            lambda a: jnp.asarray(a, jnp.float64), hogp.init_params(2)
        )
        truth, _ = ravel_pytree(
            jax.grad(lambda q: hogp.nll(q, jnp.asarray(x64), jnp.asarray(y64)))(
                p64
            )
        )
        truth = np.asarray(truth)
    finally:
        jax.config.update("jax_enable_x64", False)

    p32 = hogp.init_params(2)
    x32 = jnp.asarray(x64, jnp.float32)
    y32 = jnp.asarray(y64, jnp.float32)
    g_custom, _ = ravel_pytree(
        jax.grad(lambda q: hogp.nll(q, x32, y32))(p32)
    )
    g_eigh, _ = ravel_pytree(
        jax.grad(lambda q: hogp.nll_with_state(q, x32, y32)[0])(p32)
    )
    rel_custom = np.abs(np.asarray(g_custom) - truth) / np.abs(truth)
    rel_eigh = np.abs(np.asarray(g_eigh) - truth) / np.abs(truth)
    assert rel_custom.max() < 0.01, rel_custom
    # document the failure mode this replaced: eigh autodiff is much worse
    assert rel_eigh.max() > 10 * rel_custom.max(), (rel_eigh, rel_custom)


def test_hogp_nll_value_equals_state_path():
    """`nll` (custom-VJP training path) and `nll_with_state` (predict-state
    path) must produce identical loss values, incl. the y_var branch."""
    rng = np.random.default_rng(5)
    n, shape = 12, (4, 3)
    x = jnp.asarray(rng.random((n, 2)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((n,) + shape), jnp.float32)
    yv = jnp.asarray(rng.random(n), jnp.float32) * 0.1
    hogp = HOGP(kernel=ARDKernel(), output_shape=shape)
    p = hogp.init_params(2)
    assert np.allclose(
        float(hogp.nll(p, x, y)),
        float(hogp.nll_with_state(p, x, y)[0]),
        rtol=1e-6,
    )
    assert np.allclose(
        float(hogp.nll(p, x, y, yv)),
        float(hogp.nll_with_state(p, x, y, yv)[0]),
        rtol=1e-6,
    )
