"""Data-manager behavior tests, mirroring the reference's self-check demo
(`MF_data.py:327-352`) plus brute-force property checks for row matching."""

import numpy as np
import pytest

from fidelityfusion_tpu.models.data_manager import (
    MultiFidelityDataManager,
    Normalizer,
    match_rows,
)


@pytest.fixture
def manager():
    initial_data = [
        {
            "raw_fidelity_name": "IC_thermal",
            "fidelity_indicator": 0,
            "X": np.array([[1, 2], [2, 4], [3, 6], [4, 6], [7, 3]], float),
            "Y": np.array([[5], [4], [3], [2], [1]], float),
        },
        {
            "raw_fidelity_name": "1",
            "fidelity_indicator": 1,
            "X": np.array([[1, 3], [2, 4], [7, 3], [6, 4], [7, 1]], float),
            "Y": np.array([[7], [6], [5], [4], [3]], float),
        },
    ]
    return MultiFidelityDataManager(initial_data)


def test_overlap(manager):
    """Reference demo expects overlap {(2,4),(7,3)} between fid 0 and 1."""
    cx1, y1, cx2, y2 = manager.get_overlap_input_data(0, 1)
    np.testing.assert_array_equal(cx1, [[2, 4], [7, 3]])
    np.testing.assert_array_equal(cx2, [[2, 4], [7, 3]])
    np.testing.assert_array_equal(y1, [[4], [1]])
    np.testing.assert_array_equal(y2, [[6], [5]])


def test_unique(manager):
    ux1, y1, ux2, y2 = manager.get_unique_input_data(0, 1)
    np.testing.assert_array_equal(ux1, [[1, 2], [3, 6], [4, 6]])
    np.testing.assert_array_equal(ux2, [[1, 3], [6, 4], [7, 1]])


def test_add_data_appends(manager):
    manager.add_data("1", 1, np.array([[9.0, 9.0]]), np.array([[0.0]]))
    x, y = manager.get_data(1, normal=False)
    assert len(x) == 6


def test_match_rows_vs_bruteforce(rng):
    x1 = rng.integers(0, 5, (30, 3)).astype(float)
    x2 = rng.integers(0, 5, (20, 3)).astype(float)
    m1, m2 = match_rows(x1, x2)
    brute1 = np.array([any((row == r2).all() for r2 in x2) for row in x1])
    brute2 = np.array([any((row == r1).all() for r1 in x1) for row in x2])
    np.testing.assert_array_equal(m1, brute1)
    np.testing.assert_array_equal(m2, brute2)


def test_normalizer_roundtrip(rng):
    x = rng.standard_normal((50, 3)) * 4 + 2
    y = rng.standard_normal((50, 2)) * 7 - 3
    norm = Normalizer(x, y)
    xn, yn = norm.normalize(x, y)
    assert abs(xn.mean()) < 1e-8
    mean_back, var_back = norm.denormalize(yn, np.ones_like(yn))
    np.testing.assert_allclose(mean_back, y, rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(var_back, np.full_like(y, norm.y_std**2), rtol=1e-6)


def test_normalizer_per_column_mode(rng):
    y = rng.standard_normal((50, 2)) * [1.0, 10.0]
    norm = Normalizer(np.zeros((50, 1)), y, normal_y_mode=1)
    yn = norm.normalize_y(y)
    np.testing.assert_allclose(yn.std(axis=0, ddof=1), [1.0, 1.0], rtol=1e-6)


def test_overlap_pairs_permuted_subset():
    """Overlap rows must be PAIRED by x value, not mask-selected per side:
    with a permuted (non-order-preserving) high-fidelity subset the
    reference's mask approach silently pairs y1 with the wrong y2
    (`MF_data.py:196-205`)."""
    rng = np.random.default_rng(0)
    x1 = rng.random((12, 2)).astype(np.float32)
    y1 = rng.random((12, 1)).astype(np.float32)
    perm = np.asarray([7, 2, 9, 0, 5])
    x2 = x1[perm]
    y2 = rng.random((5, 1)).astype(np.float32)
    dm = MultiFidelityDataManager([
        {"raw_fidelity_name": "0", "fidelity_indicator": 0, "X": x1, "Y": y1},
        {"raw_fidelity_name": "1", "fidelity_indicator": 1, "X": x2, "Y": y2},
    ])
    cx1, cy1, cx2, cy2 = dm.get_overlap_input_data(0, 1)
    assert len(cx1) == len(cx2) == 5
    np.testing.assert_allclose(cx1, cx2)          # row-aligned x
    np.testing.assert_allclose(cy1, y1[perm])      # y1 follows x2's order
    np.testing.assert_allclose(cy2, y2)


def test_overlap_with_duplicate_designs():
    """A BO loop can re-query the same x: duplicate rows must keep the two
    sides' row counts equal (each duplicate pairs to the first match)."""
    x1 = np.asarray([[0.1], [0.2], [0.3]], np.float32)
    y1 = np.asarray([[1.0], [2.0], [3.0]], np.float32)
    x2 = np.asarray([[0.2], [0.2], [0.9]], np.float32)  # duplicate design
    y2 = np.asarray([[5.0], [6.0], [7.0]], np.float32)
    dm = MultiFidelityDataManager([
        {"raw_fidelity_name": "0", "fidelity_indicator": 0, "X": x1, "Y": y1},
        {"raw_fidelity_name": "1", "fidelity_indicator": 1, "X": x2, "Y": y2},
    ])
    cx1, cy1, cx2, cy2 = dm.get_overlap_input_data(0, 1)
    assert len(cy1) == len(cy2) == 2
    np.testing.assert_allclose(cy1.ravel(), [2.0, 2.0])
    np.testing.assert_allclose(cy2.ravel(), [5.0, 6.0])
