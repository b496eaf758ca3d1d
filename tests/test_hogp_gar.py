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
