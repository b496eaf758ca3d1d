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


def test_car_nonsubset_imputation_path():
    """CAR with disjoint fidelity designs (zero overlap): the reference's
    overlap-only training crashes here (`CAR...py:133`); our
    if_nonsubset=True uses the framework imputation path
    (get_nonsubset_fill_data) like AR/NAR/ResGP.  Found by the round-4
    zoo robustness sweep."""
    import numpy as np

    from fidelityfusion_tpu.models.car import (
        ContinuousAutoRegression, train_CAR,
    )
    from fidelityfusion_tpu.models.data_manager import MultiFidelityDataManager
    from fidelityfusion_tpu.ops.kernels import ARDKernel

    rng = np.random.default_rng(0)
    x_low = np.sort(rng.random((40, 1)).astype(np.float32) * 10, axis=0)
    x_high = np.sort(rng.random((12, 1)).astype(np.float32) * 10, axis=0)
    # disjoint by construction: no row of x_high appears in x_low
    y_low = np.sin(x_low) - 0.2 * rng.random((40, 1)).astype(np.float32)
    y_high = np.sin(x_high).astype(np.float32)
    dm = MultiFidelityDataManager([
        {"raw_fidelity_name": "0", "fidelity_indicator": 0,
         "X": x_low, "Y": y_low},
        {"raw_fidelity_name": "1", "fidelity_indicator": 1,
         "X": x_high, "Y": y_high},
    ])
    model = ContinuousAutoRegression(
        2, [ARDKernel() for _ in range(2)], input_dim=1, if_nonsubset=True)
    train_CAR(model, dm, max_iter=60, lr_init=1e-2, n_restarts=2)
    x_test = np.linspace(0, 10, 50, dtype=np.float32).reshape(-1, 1)
    mean, cov = model.forward(dm, x_test)
    assert np.all(np.isfinite(np.asarray(mean)))
    assert np.all(np.isfinite(np.asarray(cov)))
    rmse = float(np.sqrt(np.mean((np.asarray(mean).ravel()
                                  - np.sin(x_test).ravel()) ** 2)))
    assert rmse < 0.5, rmse


def test_car_empty_overlap_autofallback():
    """Default (subset-protocol) CAR must NOT crash when the fidelity
    overlap is empty or a single row: train_CAR falls back to the
    imputation path automatically (the reference crashes on its 0x0
    overlap Gram; our round-4 nonsubset head-to-head hit the same at
    n=32 where E[|overlap|] = n^2/500 ~ 2)."""
    import numpy as np

    from fidelityfusion_tpu.models.car import (
        ContinuousAutoRegression, train_CAR,
    )
    from fidelityfusion_tpu.models.data_manager import MultiFidelityDataManager
    from fidelityfusion_tpu.ops.kernels import ARDKernel

    rng = np.random.default_rng(3)
    x_low = np.sort(rng.random((32, 1)).astype(np.float32) * 10, axis=0)
    x_high = x_low[:1]  # 1-row overlap: cannot fit a residual GP on it
    y_low = np.sin(x_low) - 0.2 * rng.random((32, 1)).astype(np.float32)
    y_high = np.sin(x_high).astype(np.float32)
    dm = MultiFidelityDataManager([
        {"raw_fidelity_name": "0", "fidelity_indicator": 0,
         "X": x_low, "Y": y_low},
        {"raw_fidelity_name": "1", "fidelity_indicator": 1,
         "X": x_high, "Y": y_high},
    ])
    model = ContinuousAutoRegression(
        2, [ARDKernel() for _ in range(2)], input_dim=1)  # default subset
    train_CAR(model, dm, max_iter=40, lr_init=1e-2, n_restarts=2)
    x_test = np.linspace(0, 10, 50, dtype=np.float32).reshape(-1, 1)
    mean, cov = model.forward(dm, x_test)
    assert np.all(np.isfinite(np.asarray(mean)))
    assert np.all(np.isfinite(np.asarray(cov)))
