"""End-to-end AR multi-fidelity tests on the seeded toy sin fixture
(the reference's canonical demo, `AR_autoRegression.py:143-191`)."""

import numpy as np
import jax.numpy as jnp

from fidelityfusion_tpu.models.ar import AR, train_AR
from fidelityfusion_tpu.models.data_manager import MultiFidelityDataManager
from fidelityfusion_tpu.ops.kernels import SquaredExponentialKernel


def build_manager(toy_sin_data):
    initial = [
        {
            "raw_fidelity_name": str(i),
            "fidelity_indicator": i,
            "X": x,
            "Y": y,
        }
        for i, (x, y) in enumerate(toy_sin_data["train"])
    ]
    return MultiFidelityDataManager(initial)


def _run_ar(toy_sin_data, if_nonsubset, max_iter=300, lr=5e-2):
    dm = build_manager(toy_sin_data)
    fidelity_num = 3
    kernel_list = [SquaredExponentialKernel() for _ in range(fidelity_num)]
    model = AR(
        fidelity_num=fidelity_num,
        kernel_list=kernel_list,
        rho_init=1.0,
        if_nonsubset=if_nonsubset,
        input_dim=1,
    )
    train_AR(model, dm, max_iter=max_iter, lr_init=lr)
    x_test, y_test = toy_sin_data["test"]
    mean, cov = model.forward(dm, jnp.asarray(x_test, jnp.float32))
    var = np.diagonal(np.asarray(cov))
    rmse = float(np.sqrt(np.mean((np.asarray(mean).ravel() - y_test.ravel()) ** 2)))
    return rmse, var


def test_ar_subset_toy(toy_sin_data):
    rmse, var = _run_ar(toy_sin_data, if_nonsubset=False)
    # Reference CPU run achieves ~0.03-0.1 RMSE on this fixture at 200 iters.
    assert rmse < 0.1, f"AR subset rmse {rmse}"
    assert np.all(np.asarray(var) > 0)


def test_ar_nonsubset_toy(toy_sin_data):
    rmse, _ = _run_ar(toy_sin_data, if_nonsubset=True)
    assert rmse < 0.3, f"AR nonsubset rmse {rmse}"


def test_ar_to_fidelity_cascade(toy_sin_data):
    dm = build_manager(toy_sin_data)
    kernel_list = [SquaredExponentialKernel() for _ in range(3)]
    model = AR(3, kernel_list, input_dim=1)
    train_AR(model, dm, max_iter=30, lr_init=1e-2)
    xt = jnp.asarray(toy_sin_data["test"][0], jnp.float32)
    m0, _ = model.forward(dm, xt, to_fidelity=0)
    m2, _ = model.forward(dm, xt, to_fidelity=2)
    assert m0.shape == m2.shape
    assert not np.allclose(np.asarray(m0), np.asarray(m2))


def test_ar_restarts(toy_sin_data):
    dm = build_manager(toy_sin_data)
    kernel_list = [SquaredExponentialKernel() for _ in range(3)]
    model = AR(3, kernel_list, input_dim=1)
    hist = train_AR(model, dm, max_iter=30, lr_init=1e-2, n_restarts=3)
    assert len(hist) == 3


def test_ar_padded_training_equivalence(toy_sin_data):
    """pad_multiple gives the same quality and keeps stage shapes in fixed
    buckets (the static-shape story for growing BO datasets)."""
    dm = build_manager(toy_sin_data)
    model = AR(3, [SquaredExponentialKernel() for _ in range(3)], input_dim=1)
    train_AR(model, dm, max_iter=200, lr_init=5e-2, n_restarts=1,
             pad_multiple=64)
    x_test, y_test = toy_sin_data["test"]
    mean, _ = model.forward(dm, jnp.asarray(x_test, jnp.float32))
    rmse = float(np.sqrt(np.mean((np.asarray(mean).ravel() - y_test.ravel()) ** 2)))
    assert rmse < 0.15, f"padded AR rmse {rmse}"
    # residual datasets must contain only live rows
    x_r, _ = dm.get_data_by_name("res-1")
    assert len(x_r) <= 300
    assert not np.allclose(x_r[-1], 0.0)


def test_ar_training_deterministic(toy_sin_data):
    """Same seed -> bitwise-identical predictions (the framework's
    determinism story: explicit PRNG keys everywhere, no global RNG —
    SURVEY.md §5.2)."""
    preds = []
    for _ in range(2):
        dm = build_manager(toy_sin_data)
        model = AR(3, [SquaredExponentialKernel() for _ in range(3)], input_dim=1)
        train_AR(model, dm, max_iter=40, lr_init=5e-2, n_restarts=2, seed=7)
        mean, _ = model.forward(
            dm, jnp.asarray(toy_sin_data["test"][0], jnp.float32)
        )
        preds.append(np.asarray(mean))
    np.testing.assert_array_equal(preds[0], preds[1])


def test_ar_functional_posterior_matches_forward(toy_sin_data):
    """export_posterior/ARPosterior must reproduce forward's cascade
    (means exact, diagonal variances vs full-cov diagonal), padded or not,
    and the score path must be jit-cacheable as a static argument."""
    import jax

    dm = build_manager(toy_sin_data)
    model = AR(3, [SquaredExponentialKernel() for _ in range(3)], input_dim=1)
    train_AR(model, dm, max_iter=60, lr_init=5e-2, n_restarts=1)
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

    # hashability contract: equal specs -> equal static jit keys
    post2, _ = model.export_posterior(dm, pad_multiple=16)
    assert hash(post2) == hash(post) or post2 == post


def test_mf_acq_score_cached_ascent(toy_sin_data):
    """One compiled ascent reused across changing state values."""
    import jax
    from fidelityfusion_tpu.bo.mf_acq import MFAcqScore
    from fidelityfusion_tpu.bo.optimize import optimize_acqf

    dm = build_manager(toy_sin_data)
    model = AR(3, [SquaredExponentialKernel() for _ in range(3)], input_dim=1)
    train_AR(model, dm, max_iter=40, lr_init=5e-2, n_restarts=1)
    post, state = model.export_posterior(dm, to_fidelity=1, pad_multiple=16)
    score = MFAcqScore(post, method="UCB", beta=0.4)
    bounds = jnp.asarray([[0.0, 20.0]], jnp.float32)
    x1, v1 = optimize_acqf(score, bounds, jax.random.PRNGKey(0),
                           raw_samples=8, steps=10, acq_args=(state, jnp.float32(0.5)))
    assert 0.0 <= float(x1[0]) <= 20.0 and np.isfinite(float(v1))
    # same program, different state values (e.g. next BO iteration)
    x2, v2 = optimize_acqf(score, bounds, jax.random.PRNGKey(1),
                           raw_samples=8, steps=10, acq_args=(state, jnp.float32(0.9)))
    assert np.isfinite(float(v2))
