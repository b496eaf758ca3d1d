"""CAR (staged + joint/large) and FIDES tests."""

import numpy as np
import jax.numpy as jnp

from fidelityfusion_tpu.models.car import (
    ContinuousAutoRegression,
    ContinuousAutoRegressionLarge,
    train_CAR,
    train_CAR_large,
)
from fidelityfusion_tpu.models.fides import FIDES, FidelityBounds
from fidelityfusion_tpu.ops.kernels import ARDKernel
from fidelityfusion_tpu.train.fit import fit
from tests.test_ar import build_manager


def test_car_staged(toy_sin_data):
    dm = build_manager(toy_sin_data)
    model = ContinuousAutoRegression(
        3, [ARDKernel() for _ in range(3)], b_init=1.0, input_dim=1
    )
    train_CAR(model, dm, max_iter=200, lr_init=5e-2)
    x_test, y_test = toy_sin_data["test"]
    mean, cov = model.forward(dm, jnp.asarray(x_test, jnp.float32))
    rmse = float(np.sqrt(np.mean((np.asarray(mean).ravel() - y_test.ravel()) ** 2)))
    assert rmse < 0.25, f"CAR rmse {rmse}"


def test_car_large_joint(toy_sin_data):
    dm = build_manager(toy_sin_data)
    model = ContinuousAutoRegressionLarge(3, ARDKernel(), input_dim=1)
    losses = train_CAR_large(model, dm, max_iter=150, lr_init=5e-2)
    assert losses[-1] < losses[0]
    x_test, y_test = toy_sin_data["test"]
    mean, cov = model.forward(dm, jnp.asarray(x_test, jnp.float32))
    rmse = float(np.sqrt(np.mean((np.asarray(mean).ravel() - y_test.ravel()) ** 2)))
    assert rmse < 0.4, f"CAR-large rmse {rmse}"


def test_fides_fit_predict():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((40, 1)) * 6, jnp.float32)
    y = jnp.sin(x) + 0.05 * jnp.asarray(rng.standard_normal((40, 1)), jnp.float32)
    xt = jnp.linspace(0, 6, 30).reshape(-1, 1).astype(np.float32)
    fides = FIDES()
    params = fides.init_params(1)
    bounds = FidelityBounds(0.0, 1.0, 0.0, 1.0)
    res = fit(lambda p: fides.nll(p, x, y, bounds), params, steps=200, lr=5e-2)
    assert res.losses[-1] < res.losses[0]
    mean, var = fides.predict(res.params, x, y, jnp.asarray(xt), bounds)
    rmse = float(jnp.sqrt(jnp.mean((mean.ravel() - jnp.sin(xt.ravel())) ** 2)))
    assert rmse < 0.2, f"FIDES rmse {rmse}"
    assert np.all(np.asarray(var) > 0)


def test_fides_bounds_change_kernel():
    fides = FIDES()
    params = fides.init_params(1)
    x = jnp.ones((3, 1))
    k_low = fides.kernel(params, x, x, FidelityBounds(0.0, 0.5, 0.0, 0.5))
    k_high = fides.kernel(params, x, x, FidelityBounds(0.0, 2.0, 0.0, 2.0))
    assert not np.allclose(np.asarray(k_low), np.asarray(k_high))
