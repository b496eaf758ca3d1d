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


def test_nar_subset(toy_sin_data):
    dm = build_manager(toy_sin_data)
    model = NAR(3, [SquaredExponentialKernel() for _ in range(3)], input_dim=1)
    train_NAR(model, dm, max_iter=300, lr_init=5e-2)
    rmse, _ = _predict_rmse(model, dm, toy_sin_data)
    assert rmse < 0.1, f"NAR subset rmse {rmse}"


def test_nar_nonsubset(toy_sin_data):
    dm = build_manager(toy_sin_data)
    model = NAR(
        3, [SquaredExponentialKernel() for _ in range(3)], if_nonsubset=True, input_dim=1
    )
    train_NAR(model, dm, max_iter=300, lr_init=5e-2)
    rmse, _ = _predict_rmse(model, dm, toy_sin_data)
    assert rmse < 0.3, f"NAR nonsubset rmse {rmse}"
