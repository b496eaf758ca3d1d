"""Joint (legacy-contract) training tests: one Adam over all fidelities."""

import numpy as np
import jax.numpy as jnp
import pytest

from fidelityfusion_tpu.models.ar import AR
from fidelityfusion_tpu.models.car import ContinuousAutoRegression
from fidelityfusion_tpu.models.joint import train_joint
from fidelityfusion_tpu.models.nar import NAR
from fidelityfusion_tpu.models.resgp import ResGP
from fidelityfusion_tpu.ops.kernels import ARDKernel, SquaredExponentialKernel
from tests.test_ar import build_manager


def _rmse(model, dm, toy_sin_data):
    x_test, y_test = toy_sin_data["test"]
    mean, _ = model.forward(dm, jnp.asarray(x_test, jnp.float32))
    return float(np.sqrt(np.mean((np.asarray(mean).ravel() - y_test.ravel()) ** 2)))


@pytest.mark.parametrize(
    "cls,kernels",
    [
        (AR, SquaredExponentialKernel),
        (ResGP, SquaredExponentialKernel),
        (NAR, SquaredExponentialKernel),
    ],
)
def test_joint_training_cascade(toy_sin_data, cls, kernels):
    dm = build_manager(toy_sin_data)
    model = cls(3, [kernels() for _ in range(3)], input_dim=1)
    losses = train_joint(model, dm, max_iter=400, lr_init=5e-2)
    assert losses[-1] < losses[0]
    rmse = _rmse(model, dm, toy_sin_data)
    assert rmse < 0.35, f"{cls.__name__} joint rmse {rmse}"


def test_joint_car(toy_sin_data):
    dm = build_manager(toy_sin_data)
    model = ContinuousAutoRegression(3, [ARDKernel()] * 3, input_dim=1)
    losses = np.asarray(train_joint(model, dm, max_iter=300, lr_init=2e-2))
    finite = losses[np.isfinite(losses)]
    # the NaN guard may truncate late steps; the last finite loss must improve
    assert finite[-1] < finite[0]
    rmse = _rmse(model, dm, toy_sin_data)
    assert rmse < 0.5, f"CAR joint rmse {rmse}"


@pytest.mark.parametrize(
    "cls", [AR, ResGP, NAR],
)
def test_joint_nonsubset_staged_imputation(toy_sin_data, cls):
    """Non-subset joint training (staged imputation between rounds,
    `MFGP_ver2023May/AR_AutoRegression.py:180-203` contract): accuracy must
    match the staged trainer's on the toy fixture (staged nonsubset AR
    asserts < 0.3 in tests/test_ar.py)."""
    dm = build_manager(toy_sin_data)
    model = cls(3, [SquaredExponentialKernel() for _ in range(3)],
                input_dim=1, if_nonsubset=True)
    losses = np.asarray(train_joint(model, dm, max_iter=400, lr_init=5e-2,
                                    rounds=4))
    assert losses.shape[0] >= 400
    finite = losses[np.isfinite(losses)]
    assert finite[-1] < finite[0]
    rmse = _rmse(model, dm, toy_sin_data)
    assert rmse < 0.35, f"{cls.__name__} nonsubset joint rmse {rmse}"


# -------------------------------------------------------------- tensor models


def _poisson_manager(flatten=False):
    from fidelityfusion_tpu.data.pde import generate_poisson_mf_dataset
    from fidelityfusion_tpu.models.data_manager import MultiFidelityDataManager

    x, ys = generate_poisson_mf_dataset(
        n_samples=48, resolutions=(6, 10, 14), d_in=4, seed=3
    )
    if flatten:
        ys = [y.reshape(len(y), -1) for y in ys]
    initial = []
    for i, (y, n) in enumerate(zip(ys, (40, 32, 24))):
        initial.append(
            {
                "raw_fidelity_name": str(i),
                "fidelity_indicator": i,
                "X": x[:n],
                "Y": y[:n],
            }
        )
    return x, ys, MultiFidelityDataManager(initial)


def test_joint_gar(toy_sin_data):
    """Joint GAR: all stage HOGPs + TensorLinear lifts under ONE Adam
    (the legacy 8-model joint contract, `mfgp_demo.py:118-127` +
    `GAR_GeneralizedAutoAR.py`)."""
    from fidelityfusion_tpu.models.gar import GAR

    x, ys, dm = _poisson_manager()
    shapes = [y.shape[1:] for y in ys]
    model = GAR(3, [ARDKernel() for _ in range(3)], shapes,
                input_dim=x.shape[1])
    losses = np.asarray(train_joint(model, dm, max_iter=120, lr_init=5e-2))
    finite = losses[np.isfinite(losses)]
    assert finite[-1] < finite[0]
    mean, var = model.forward(dm, jnp.asarray(x[40:], jnp.float32))
    truth = ys[2][40:]
    rel = np.linalg.norm(np.asarray(mean) - truth) / np.linalg.norm(truth)
    assert rel < 0.6, f"joint GAR rel err {rel}"
    assert np.all(np.isfinite(np.asarray(var)))


def test_joint_cigar(toy_sin_data):
    from fidelityfusion_tpu.models.cigar import CIGAR

    x, ys, dm = _poisson_manager(flatten=True)
    shapes = [(6, 6), (10, 10), (14, 14)]
    model = CIGAR(3, [ARDKernel() for _ in range(3)], shapes,
                  input_dim=x.shape[1])
    losses = np.asarray(train_joint(model, dm, max_iter=120, lr_init=5e-2))
    finite = losses[np.isfinite(losses)]
    assert finite[-1] < finite[0]
    mean, var = model.forward(dm, jnp.asarray(x[40:], jnp.float32))
    truth = ys[2][40:]
    rel = np.linalg.norm(np.asarray(mean) - truth) / np.linalg.norm(truth)
    assert rel < 0.6, f"joint CIGAR rel err {rel}"
    assert np.all(np.asarray(var) > 0)


def test_joint_gar_nonsubset(toy_sin_data):
    """Non-subset joint GAR: staged imputation rounds with posterior-state
    refresh (round 0 imputes with the initialized cascade, matching the
    legacy epoch-loop contract `AR_AutoRegression.py:180-203`)."""
    from fidelityfusion_tpu.models.gar import GAR

    x, ys, dm = _poisson_manager()
    shapes = [y.shape[1:] for y in ys]
    model = GAR(3, [ARDKernel() for _ in range(3)], shapes,
                input_dim=x.shape[1], if_nonsubset=True)
    losses = np.asarray(train_joint(model, dm, max_iter=120, lr_init=5e-2,
                                    rounds=3))
    finite = losses[np.isfinite(losses)]
    assert finite[-1] < finite[0]
    mean, _ = model.forward(dm, jnp.asarray(x[40:], jnp.float32))
    truth = ys[2][40:]
    rel = np.linalg.norm(np.asarray(mean) - truth) / np.linalg.norm(truth)
    assert rel < 0.8, f"nonsubset joint GAR rel err {rel}"


def test_joint_cigar_nonsubset(toy_sin_data):
    from fidelityfusion_tpu.models.cigar import CIGAR

    x, ys, dm = _poisson_manager(flatten=True)
    shapes = [(6, 6), (10, 10), (14, 14)]
    model = CIGAR(3, [ARDKernel() for _ in range(3)], shapes,
                  input_dim=x.shape[1], if_nonsubset=True)
    losses = np.asarray(train_joint(model, dm, max_iter=120, lr_init=5e-2,
                                    rounds=3))
    finite = losses[np.isfinite(losses)]
    assert finite[-1] < finite[0]
    mean, _ = model.forward(dm, jnp.asarray(x[40:], jnp.float32))
    truth = ys[2][40:]
    rel = np.linalg.norm(np.asarray(mean) - truth) / np.linalg.norm(truth)
    assert rel < 0.8, f"nonsubset joint CIGAR rel err {rel}"
