"""Sanity tests for the 41-function multi-fidelity zoo."""

import numpy as np
import pytest

from fidelityfusion_tpu.data.zoo import ZOO, multi_fidelity_forrester_my


@pytest.mark.parametrize("name", sorted(ZOO.keys()))
def test_zoo_function_contract(name):
    """Uniform API: (x, [y_f0, ...]) with matching shapes, finite values,
    deterministic under a fixed seed, and fidelities actually differ."""
    fn, x_dim, n_fid = ZOO[name]
    x, ys = fn(num_points=16, seed=0)
    assert x.shape == (16, x_dim), f"{name}: x shape {x.shape}"
    assert len(ys) == n_fid, f"{name}: {len(ys)} fidelities != {n_fid}"
    for y in ys:
        assert y.shape == (16, 1), f"{name}: y shape {y.shape}"
        assert np.all(np.isfinite(y)), f"{name}: non-finite outputs"
    # deterministic resampling
    x2, ys2 = fn(num_points=16, seed=0)
    np.testing.assert_array_equal(x, x2)
    np.testing.assert_array_equal(ys[0], ys2[0])
    # fidelity levels differ but correlate (it IS a multi-fidelity pair)
    lo, hi = ys[0].ravel(), ys[-1].ravel()
    assert not np.allclose(lo, hi), f"{name}: fidelities identical"


def test_zoo_accepts_user_x():
    fn, d, _ = ZOO["tl1"]
    x = np.linspace(0, 1, 7).reshape(-1, 1)
    x_out, ys = fn(x=x)
    np.testing.assert_array_equal(x_out, x)
    # tl1 exact values
    want_hi = (6 * x - 2) ** 2 * np.sin(12 * x - 4)
    np.testing.assert_allclose(ys[1], want_hi, rtol=1e-10)


def test_forrester_fidelity_ordering():
    """forrester_my preserves the reference's [f1..f4] ordering with f1 the
    HF Forrester function (`collected_data.py:50`)."""
    x = np.array([[0.5]])
    _, ys = multi_fidelity_forrester_my(x=x)
    f1 = (6 * 0.5 - 2) ** 2 * np.sin(12 * 0.5 - 4)
    np.testing.assert_allclose(ys[0].ravel()[0], f1, rtol=1e-10)
    f4 = 0.5 * f1 + 10 * (0.5 - 0.5) - 5
    np.testing.assert_allclose(ys[3].ravel()[0], f4, rtol=1e-10)


def test_zoo_count():
    assert len(ZOO) == 41
