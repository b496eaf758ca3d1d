"""Two-fidelity pedagogic compat layer (`models/two_fidelity.py`).

Covers the reference's `FidelityFusion_Models/two_fidelity_models/` API
shape: `Model(); train_X_twofidelity(model, x_train, y_train);
model.forward(x_test)` plus `find_subsets_and_indexes`.
"""

import numpy as np
import pytest

from fidelityfusion_tpu.models.two_fidelity import (
    ARTwoFidelity,
    GARTwoFidelity,
    NARTwoFidelity,
    ResGPTwoFidelity,
    find_subsets_and_indexes,
    train_AR_twofidelity,
    train_GAR_twofidelity,
    train_NAR_twofidelity,
    train_ResGP_twofidelity,
)


@pytest.fixture(scope="module")
def two_fid_data():
    rng = np.random.default_rng(3)
    x_low = np.sort(rng.random((40, 1)).astype(np.float32) * 10, axis=0)
    x_high = x_low[:24]
    y_low = np.sin(x_low) - 0.5 * np.sin(2 * x_low)
    y_high = np.sin(x_high)
    return [x_low, x_high], [y_low, y_high]


def test_find_subsets_and_indexes():
    x_low = np.arange(8, dtype=np.float32).reshape(-1, 1)
    x_high = x_low[[1, 3, 5]]
    sub, il, ih = find_subsets_and_indexes(x_low, x_high)
    assert sub.shape == (3, 1)
    np.testing.assert_array_equal(x_low[il], x_high[ih])
    np.testing.assert_array_equal(sorted(il.tolist()), [1, 3, 5])


def test_find_subsets_1d_inputs():
    # The reference's torch.isin version accepted flat 1-D design vectors
    # (`two_fidelity_models/AR_autoRegression.py:15-22`); each scalar is a
    # design point, so 1-D inputs must be treated as column vectors.
    x_low = np.arange(8, dtype=np.float32)
    x_high = np.asarray([1.0, 3.0, 5.0], np.float32)
    sub, il, ih = find_subsets_and_indexes(x_low, x_high)
    assert sub.shape == (3, 1)
    np.testing.assert_array_equal(sorted(il.tolist()), [1, 3, 5])
    # mixed 1-D low + 2-D high must behave identically (not silently empty)
    sub2, il2, ih2 = find_subsets_and_indexes(x_low, x_high.reshape(-1, 1))
    np.testing.assert_array_equal(il, il2)
    np.testing.assert_array_equal(ih, ih2)


def test_find_subsets_dim_mismatch_raises():
    with pytest.raises(ValueError):
        find_subsets_and_indexes(np.zeros((4, 2), np.float32),
                                 np.zeros((3, 5), np.float32))


def test_find_subsets_multidim():
    rng = np.random.default_rng(0)
    x_low = rng.random((10, 3)).astype(np.float32)
    x_high = x_low[[0, 4, 7]]
    sub, il, ih = find_subsets_and_indexes(x_low, x_high)
    np.testing.assert_array_equal(sorted(il.tolist()), [0, 4, 7])
    np.testing.assert_allclose(sub, x_low[[0, 4, 7]])


@pytest.mark.parametrize(
    "cls,train_fn",
    [
        (ARTwoFidelity, train_AR_twofidelity),
        (NARTwoFidelity, train_NAR_twofidelity),
        (ResGPTwoFidelity, train_ResGP_twofidelity),
    ],
)
def test_two_fidelity_vector_models(cls, train_fn, two_fid_data):
    x_train, y_train = two_fid_data
    model = cls()
    train_fn(model, x_train, y_train, max_iter=60, lr_init=5e-2,
             n_restarts=1)
    x_test = np.linspace(0.5, 9.5, 30, dtype=np.float32).reshape(-1, 1)
    mean, cov = model.forward(x_test)
    assert mean.shape == (30, 1)
    assert np.all(np.isfinite(np.asarray(mean)))
    rmse = float(np.sqrt(np.mean((np.asarray(mean) - np.sin(x_test)) ** 2)))
    assert rmse < 0.5  # in-fill accuracy on the smooth toy


def test_two_fidelity_gar():
    rng = np.random.default_rng(5)
    x_low = rng.random((20, 1)).astype(np.float32)
    x_high = x_low[:12]
    y_low = np.sin(2 * np.pi * x_low)[:, :, None] * np.ones((1, 4, 4), np.float32)
    y_high = np.sin(2 * np.pi * x_high)[:, :, None] * np.ones((1, 6, 6), np.float32)
    model = GARTwoFidelity((4, 4), (6, 6))
    train_GAR_twofidelity(model, [x_low, x_high], [y_low, y_high],
                          max_iter=30, lr_init=5e-2, n_restarts=1)
    mean, var = model.forward(x_high[:5])
    assert np.asarray(mean).shape == (5, 6, 6)
    assert np.all(np.isfinite(np.asarray(mean)))


def test_forward_before_train_raises():
    with pytest.raises(RuntimeError):
        ARTwoFidelity().forward(np.zeros((3, 1), np.float32))
