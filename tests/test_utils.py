"""Utils tests: subset tools, normalize layers, checkpointing, plots."""

import numpy as np
import jax.numpy as jnp
import pytest

from fidelityfusion_tpu.utils.checkpoint import (
    load_bo_state,
    restore_pytree,
    save_bo_state,
    save_pytree,
)
from fidelityfusion_tpu.utils.logging import LogDebugger
from fidelityfusion_tpu.utils.subset_tools import (
    DatasetNormalizeManager,
    Normalize0Layer,
    SubsetChecker,
)


def test_subset_checker_self_test():
    assert SubsetChecker.self_test(seed=3)


def test_subset_checker_get_subset():
    x1 = np.array([[1.0, 2], [3, 4], [5, 6]])
    x2 = np.array([[5.0, 6], [9, 9]])
    i1, i2 = SubsetChecker.get_subset(x1, x2)
    assert i1.tolist() == [2]
    assert i2.tolist() == [0]
    non = SubsetChecker.get_non_subset(x1, x2)
    assert non.tolist() == [0, 1]


def test_normalize0_layer_roundtrip(rng):
    data = rng.standard_normal((10, 4)) * 3 + 7
    layer = Normalize0Layer(data)
    fwd = layer.forward(data)
    assert abs(fwd.mean()) < 1e-8
    np.testing.assert_allclose(layer.inverse(fwd), data, rtol=1e-8)
    np.testing.assert_allclose(layer.inverse_var(np.ones(3)), layer.std**2 * np.ones(3))


def test_normalize_layer_per_dim(rng):
    from fidelityfusion_tpu.utils.subset_tools import NormalizeLayer

    data = rng.standard_normal((30, 3)) * np.array([1.0, 5.0, 0.2]) + 2.0
    layer = NormalizeLayer(data)
    fwd = layer.forward(data)
    np.testing.assert_allclose(fwd.mean(axis=0), 0.0, atol=1e-10)
    np.testing.assert_allclose(layer.inverse(fwd), data, rtol=1e-8)


def test_normalize_distribution_layers(rng):
    from fidelityfusion_tpu.utils.subset_tools import (
        Normalize0DistributionLayer,
        NormalizeDistributionLayer,
    )

    data = rng.standard_normal((20, 3)) * 4 + 1
    Sigma = np.eye(3) * 2.0

    l0 = Normalize0DistributionLayer(data)
    m, S = l0.forward(data, Sigma)
    m2, S2 = l0.inverse(m, S)
    np.testing.assert_allclose(m2, data, rtol=1e-8)
    np.testing.assert_allclose(S2, Sigma, rtol=1e-8)

    x = data[0]
    ld = NormalizeDistributionLayer(data)
    m, S = ld.forward(x, Sigma)
    # forward/inverse covariance transforms are exact inverses
    m2, S2 = ld.inverse(m, S)
    np.testing.assert_allclose(m2, x, rtol=1e-8)
    np.testing.assert_allclose(S2, Sigma, rtol=1e-8)
    # D^{-1} Sigma D^{-1} with D = diag(std)
    D_inv = np.diag(1.0 / ld.std)
    _, S_fwd = ld.forward(x, Sigma)
    np.testing.assert_allclose(S_fwd, D_inv @ Sigma @ D_inv, rtol=1e-8)


def test_dataset_normalize_manager(rng):
    xs = [rng.random((20, 2)) * 5, rng.random((10, 2)) * 5]
    ys = [rng.random((20, 1)), rng.random((10, 1))]
    mgr = DatasetNormalizeManager(xs, ys)
    xn, yn = mgr.normalize_all(xs, ys)
    for y in yn:
        assert abs(np.mean(y)) < 1e-6
    m, v = mgr.denormalize_output(0, yn[0], np.ones_like(yn[0]))
    np.testing.assert_allclose(m, ys[0], rtol=1e-6, atol=1e-8)


def test_pytree_checkpoint_roundtrip(tmp_path):
    tree = {"a": jnp.arange(4.0), "b": [jnp.ones((2, 2)), jnp.zeros(3)]}
    path = save_pytree(str(tmp_path / "ckpt"), tree)
    restored = restore_pytree(path, like=tree)
    for x, y in zip(
        jnp.broadcast_arrays(tree["a"], jnp.asarray(restored["a"]))
        if isinstance(restored, dict)
        else [],
        [],
    ):
        pass
    import jax

    for a, b in zip(
        jax.tree_util.tree_leaves(tree), jax.tree_util.tree_leaves(restored)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_bo_state_roundtrip(tmp_path):
    record = {"cost": [1.0, 2.0], "incumbents": [0.5, 0.7]}
    xs = [np.random.rand(5, 2), np.random.rand(3, 2)]
    ys = [np.random.rand(5, 1), np.random.rand(3, 1)]
    p = str(tmp_path / "bo.npz")
    save_bo_state(p, record, xs, ys)
    rec, xs2, ys2 = load_bo_state(p)
    assert rec == record
    np.testing.assert_allclose(xs2[1], xs[1])


def test_log_debugger_records(tmp_path):
    dbg = LogDebugger("TEST", log_dir=str(tmp_path), capture_excepthook=False)
    dbg.record_stage(0, np.array([3.0, 2.0, np.nan, 1.0]))
    assert len(dbg.histories) == 1
    path = dbg.save_rollback({"w": jnp.ones(3)})
    assert path.endswith(".npz")


def test_sweep_plots(tmp_path):
    """plots.py aggregates sweep CSVs into a figure."""
    import csv

    d = tmp_path / "tl112"
    d.mkdir()
    for seed in (0, 1):
        with open(d / f"AR_seed_{seed}.csv", "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=["n_high", "rmse", "nrmse", "r2", "nll", "time"])
            w.writeheader()
            for n_high, rmse in [(4, 0.5 + 0.1 * seed), (8, 0.3), (16, 0.1)]:
                w.writerow({"n_high": n_high, "rmse": rmse, "nrmse": rmse,
                            "r2": 1 - rmse, "nll": 0.0, "time": 1.0})
    from fidelityfusion_tpu.experiments.plots import (
        aggregate_metric,
        load_sweep_results,
        plot_metric_vs_nhigh,
    )

    res = load_sweep_results(str(tmp_path), "tl112")
    assert set(res) == {"AR"} and set(res["AR"]) == {0, 1}
    agg = aggregate_metric(res, "rmse")
    ns, mean, std = agg["AR"]
    assert ns.tolist() == [4.0, 8.0, 16.0]
    fig = plot_metric_vs_nhigh(str(tmp_path), "tl112", save_to=str(tmp_path / "fig.png"))
    assert (tmp_path / "fig.png").exists()


def test_fit_restarts_returns_verified_finite_params():
    """NaN-rollback 2-cycle regression: once a deterministic update
    produces a non-finite loss, rollback re-tries the SAME update forever
    (finite, NaN, finite, ...).  The returned params must be the last
    VERIFIED-finite point, never the one-update-ahead NaN-producing one,
    and restart scoring must use each trajectory's last finite loss."""
    import jax
    import jax.numpy as jnp

    from fidelityfusion_tpu.train.fit import fit, fit_restarts

    # loss = x^2 but NaN once |x| crosses into the trap region: Adam from
    # x0 with a big lr steps into the trap and oscillates
    def loss(p):
        x = p["x"][0]
        val = jnp.where(jnp.abs(x) > 0.5, jnp.nan, x * x)
        return val

    p0 = {"x": jnp.asarray([0.45], jnp.float32)}
    result = fit(loss, p0, steps=50, lr=0.3)
    assert np.isfinite(float(loss(result.params))), result.params

    batch = {"x": jnp.asarray([[0.45], [0.1]], jnp.float32)}
    best, res = fit_restarts(loss, batch, steps=50, lr=0.3)
    assert np.isfinite(float(loss(best)))
    # the clean restart (0.1 -> heads to 0) must win
    assert abs(float(best["x"][0])) < 0.45
