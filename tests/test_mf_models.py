"""NAR / ResGP end-to-end tests on the toy sin fixture (reference demos
`NAR.py:113-162`, `ResGP.py:115-164`)."""

import numpy as np
import jax.numpy as jnp

from fidelityfusion_tpu.models.nar import NAR, train_NAR
from fidelityfusion_tpu.models.resgp import ResGP, train_ResGP
from fidelityfusion_tpu.ops.kernels import SquaredExponentialKernel
from tests.test_ar import build_manager


def _predict_rmse(model, dm, toy_sin_data, fidelity_num=3):
    x_test, y_test = toy_sin_data["test"]
    mean, cov = model.forward(dm, jnp.asarray(x_test, jnp.float32))
    cov = np.asarray(cov)
    var = np.diagonal(cov) if cov.ndim == 2 else cov
    mean = np.asarray(mean)
    return float(np.sqrt(np.mean((mean.ravel() - y_test.ravel()) ** 2))), var


def test_resgp_subset(toy_sin_data):
    dm = build_manager(toy_sin_data)
    model = ResGP(3, [SquaredExponentialKernel() for _ in range(3)], input_dim=1)
    train_ResGP(model, dm, max_iter=300, lr_init=5e-2)
    rmse, var = _predict_rmse(model, dm, toy_sin_data)
    assert rmse < 0.1, f"ResGP subset rmse {rmse}"
    assert np.all(var > 0)


def test_resgp_nonsubset(toy_sin_data):
    dm = build_manager(toy_sin_data)
    model = ResGP(
        3, [SquaredExponentialKernel() for _ in range(3)], if_nonsubset=True, input_dim=1
    )
    train_ResGP(model, dm, max_iter=300, lr_init=5e-2)
    rmse, _ = _predict_rmse(model, dm, toy_sin_data)
    assert rmse < 0.3, f"ResGP nonsubset rmse {rmse}"


def test_resgp_functional_posterior_matches_forward(toy_sin_data):
    """ResGP.export_posterior (shared rho-residual cascade export with
    rho fixed at 1) must reproduce forward's cascade, padded or not."""
    dm = build_manager(toy_sin_data)
    model = ResGP(3, [SquaredExponentialKernel() for _ in range(3)], input_dim=1)
    train_ResGP(model, dm, max_iter=60, lr_init=5e-2)
    x_test = jnp.asarray(toy_sin_data["test"][0], jnp.float32)

    mean_ref, cov_ref = model.forward(dm, x_test)
    var_ref = np.diagonal(np.asarray(cov_ref))

    for pad in (None, 16):
        post, state = model.export_posterior(dm, pad_multiple=pad)
        mean, var = post(state, x_test)
        np.testing.assert_allclose(
            np.asarray(mean).ravel(), np.asarray(mean_ref).ravel(),
            rtol=2e-3, atol=2e-3,
        )
        np.testing.assert_allclose(
            np.asarray(var).ravel(), var_ref, rtol=5e-3, atol=5e-3
        )


def test_nar_subset(toy_sin_data):
    dm = build_manager(toy_sin_data)
    model = NAR(3, [SquaredExponentialKernel() for _ in range(3)], input_dim=1)
    train_NAR(model, dm, max_iter=300, lr_init=5e-2)
    rmse, _ = _predict_rmse(model, dm, toy_sin_data)
    assert rmse < 0.1, f"NAR subset rmse {rmse}"


def test_nar_functional_posterior_matches_forward(toy_sin_data):
    """NAR.export_posterior/NARPosterior must reproduce forward's
    nonlinear cascade (mean exact; final-stage diagonal variance)."""
    dm = build_manager(toy_sin_data)
    model = NAR(3, [SquaredExponentialKernel() for _ in range(3)], input_dim=1)
    train_NAR(model, dm, max_iter=60, lr_init=5e-2)
    x_test = jnp.asarray(toy_sin_data["test"][0], jnp.float32)

    mean_ref, cov_ref = model.forward(dm, x_test)
    var_ref = np.diagonal(np.asarray(cov_ref))

    for pad in (None, 16):
        post, state = model.export_posterior(dm, pad_multiple=pad)
        mean, var = post(state, x_test)
        np.testing.assert_allclose(
            np.asarray(mean).ravel(), np.asarray(mean_ref).ravel(),
            rtol=2e-3, atol=2e-3,
        )
        np.testing.assert_allclose(
            np.asarray(var).ravel(), var_ref, rtol=5e-3, atol=5e-3
        )


def test_nar_nonsubset(toy_sin_data):
    dm = build_manager(toy_sin_data)
    model = NAR(
        3, [SquaredExponentialKernel() for _ in range(3)], if_nonsubset=True, input_dim=1
    )
    train_NAR(model, dm, max_iter=300, lr_init=5e-2)
    rmse, _ = _predict_rmse(model, dm, toy_sin_data)
    assert rmse < 0.3, f"NAR nonsubset rmse {rmse}"
