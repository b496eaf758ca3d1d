"""BO layer tests: acquisitions vs closed form, optimizer finds the argmax,
and a short end-to-end discrete MFBO loop on Forrester."""

import numpy as np
import jax
import jax.numpy as jnp
from scipy.stats import norm as scipy_norm

from fidelityfusion_tpu.bo import acq
from fidelityfusion_tpu.bo.optimize import find_next_batch, optimize_acqf
from fidelityfusion_tpu.bo.mf_acq import DiscreteMFAcquisition, optimize_acq_mf
from fidelityfusion_tpu.bo.continuous import ContinuousFidelityUCB
from fidelityfusion_tpu.bo.loop import mf_bo_discrete
from fidelityfusion_tpu.data.objectives import Forrester, NonLinearSin
from fidelityfusion_tpu.data.cost import ContinuousCost


def test_acq_closed_forms():
    mean = jnp.asarray([0.0, 1.0, -1.0])
    var = jnp.asarray([1.0, 0.25, 4.0])
    np.testing.assert_allclose(
        np.asarray(acq.ucb(mean, var, kappa=2.0)),
        np.asarray(mean) + 2.0 * np.sqrt(np.asarray(var)),
        rtol=1e-6,
    )
    f_best = 0.5
    std = np.sqrt(np.asarray(var))
    z = (np.asarray(mean) - f_best - 0.01) / std
    want_ei = (np.asarray(mean) - f_best - 0.01) * scipy_norm.cdf(z) + std * scipy_norm.pdf(z)
    np.testing.assert_allclose(np.asarray(acq.ei(mean, var, f_best)), want_ei, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(acq.pi(mean, var, f_best)), scipy_norm.cdf(z), rtol=1e-4
    )


def test_pf_multiplies_constraints():
    mean = jnp.asarray([[0.0, 0.0]])
    var = jnp.asarray([[1.0, 1.0]])
    got = float(acq.pf(mean, var, thresholds=[0.0, 0.0])[0])
    np.testing.assert_allclose(got, 0.25, rtol=1e-4)


def test_optimize_acqf_finds_peak():
    """Maximize a known unimodal function: peak at x = 0.3."""

    def acq_fn(x):
        return -jnp.sum((x - 0.3) ** 2, axis=-1)

    bounds = np.array([[0.0, 1.0]])
    x_star, v = optimize_acqf(acq_fn, bounds, jax.random.PRNGKey(0), raw_samples=8, steps=60, lr=0.05)
    np.testing.assert_allclose(np.asarray(x_star), [0.3], atol=0.02)


def test_find_next_batch_random_argmax():
    def acq_fn(x):
        return -jnp.sum((x - 0.7) ** 2, axis=-1)

    bounds = np.array([[0.0, 1.0]])
    xs = find_next_batch(acq_fn, bounds, jax.random.PRNGKey(1), batch_size=2, n_samples=500)
    assert xs.shape == (2, 1)
    np.testing.assert_allclose(np.asarray(xs), 0.7, atol=0.05)


def test_mf_acquisition_and_fidelity_selection():
    def mean_fn(x, s):
        return jnp.sum(jnp.sin(3 * x), axis=-1) + 0.1 * s

    def var_fn(x, s):
        return jnp.ones(x.shape[0]) * (1.0 / (s + 1))

    mf = DiscreteMFAcquisition(mean_fn, var_fn, fidelity_num=3, x_dimension=2, f_best=0.5)
    x = jnp.ones((4, 2)) * 0.2
    assert mf.UCB_MF(x, 0).shape == (4,)
    assert mf.EI_MF(x, 1).shape == (4,)
    assert np.all(np.isfinite(np.asarray(mf.PI_MF(x, 2))))
    # tiny gamma -> low fidelity still uncertain -> query it;
    # huge gamma -> everything looks confident -> query the top fidelity
    assert mf.acq_selection_fidelity([1e-9, 1e-9, 1e-9], x) == 0
    assert mf.acq_selection_fidelity([10.0, 10.0, 10.0], x) == 2


def test_optimize_acq_mf_picks_best_fidelity():
    def score(x, s):
        # fidelity 1 strictly dominates
        return -jnp.sum((x - 0.5) ** 2, axis=-1) + (1.0 if s == 1 else 0.0)

    bounds = np.array([[0.0, 1.0]])
    x_star, s_star, v = optimize_acq_mf(
        score, 2, bounds, jax.random.PRNGKey(0), n_iterations=40, learning_rate=0.05
    )
    assert s_star == 1
    np.testing.assert_allclose(np.asarray(x_star), [0.5], atol=0.05)


def test_continuous_fidelity_ucb_selects_z():
    def posterior_fn(x, z):
        var = jnp.ones((x.shape[0], 1)) * (1.5 - z)  # more certain at high z
        mean = jnp.sum(jnp.cos(x), axis=-1, keepdims=True)
        return mean, var

    strategy = ContinuousFidelityUCB(
        x_dimension=1,
        search_range=[[0.0, 1.0], [0.1, 1.0]],
        posterior_fn=posterior_fn,
        cost=ContinuousCost(rate=2.0, s_min=0.1, s_max=1.0),
        seed=0,
    )
    x, z = strategy.compute_next(steps=10, lr=0.05)
    assert x.shape == (1, 1)
    assert 0.1 <= z <= 1.0


def test_forrester_objective_protocol():
    f = Forrester(2)
    xs, ys = f.initiate_data({1: 10, 2: 4}, seed=1)
    assert xs[0].shape == (10, 1) and xs[1].shape == (4, 1)
    # high fidelity shares the first 2 low-fidelity points
    np.testing.assert_array_equal(xs[1][:2], xs[0][:2])
    y2 = f.get_data(np.array([[0.5]]), 2)
    want = (6 * 0.5 - 2) ** 2 * np.sin(12 * 0.5 - 4)
    np.testing.assert_allclose(y2.ravel()[0], want, rtol=1e-6)
    assert f.cost.compute_model_cost(ys) > 0


def test_mf_bo_discrete_loop_runs():
    """Short end-to-end MFBO: 3 iterations on Forrester with the AR
    surrogate — incumbents must be monotone non-decreasing and the data
    must grow (`MF_BO_discrete.py:33-152` protocol)."""
    f = Forrester(2)
    record = mf_bo_discrete(
        f,
        method="UCB",
        model_name="AR",
        bo_iterations=3,
        init_index={1: 8, 2: 4},
        seed=0,
        train_iters=40,
        acq_iterations=15,
    )
    assert len(record["incumbents"]) == 3
    inc = record["incumbents"]
    assert all(b >= a - 1e-9 for a, b in zip(inc, inc[1:]))
    assert len(record["cost"]) == 3


def test_mf_bo_discrete_loop_resgp_nar_cached_path():
    """The loop's cached acquisition path dispatches on export_posterior,
    which ResGP and NAR now provide — both surrogates must drive the
    loop end-to-end with monotone incumbents."""
    f = Forrester(2)
    for name in ("ResGP", "NAR"):
        record = mf_bo_discrete(
            f, method="UCB", model_name=name, bo_iterations=2,
            init_index={1: 8, 2: 4}, seed=0, train_iters=30,
            acq_iterations=10,
        )
        inc = record["incumbents"]
        assert len(inc) == 2
        assert all(b >= a - 1e-9 for a, b in zip(inc, inc[1:]))


def test_forrester_multi_fidelity_init():
    f4 = Forrester(4)
    xs, ys = f4.initiate_data({1: 16, 2: 8, 3: 6, 4: 4}, seed=0)
    assert [len(x) for x in xs] == [16, 8, 6, 4]
    assert len(ys) == 4
    # nested subsets: first rows of each level come from the level below
    np.testing.assert_array_equal(xs[1][:6], xs[0][:6])


def test_mf_bo_checkpoint_resume(tmp_path):
    """BO loop resumes from the persisted state and continues the record."""
    f = Forrester(2)
    ckpt = str(tmp_path / "bo.npz")
    rec1 = mf_bo_discrete(f, bo_iterations=2, init_index={1: 8, 2: 4}, seed=0,
                          train_iters=30, acq_iterations=10,
                          checkpoint_path=ckpt)
    assert len(rec1["S"]) == 2
    rec2 = mf_bo_discrete(f, bo_iterations=4, init_index={1: 8, 2: 4}, seed=0,
                          train_iters=30, acq_iterations=10,
                          checkpoint_path=ckpt)
    assert len(rec2["S"]) == 4
    assert rec2["incumbents"][:2] == rec1["incumbents"]


def test_mf_bo_ucb_gate_escalates_in_normalized_space():
    """The MF-GP-UCB fidelity gate compares beta*var against the FIXED
    gamma=0.01 of `v1/MF_UCB.py:44` — meaningful only in the surrogate's
    normalized-y space.  Forrester's O(10) output scale made the raw-space
    gate never escalate (every query stuck at fidelity 0, incumbent flat —
    the round-4 interim regression); this pins that within a short budget
    the ladder reaches the top fidelity AND the incumbent moves past the
    initial design's best."""
    from fidelityfusion_tpu.bo.loop import mf_bo_discrete
    from fidelityfusion_tpu.data.objectives import Forrester

    rec = mf_bo_discrete(Forrester(2), method="UCB", bo_iterations=5,
                         init_index={1: 10, 2: 4}, seed=0,
                         train_iters=30, acq_iterations=10)
    assert any(int(s) == 1 for s in rec["S"]), rec["S"]
    assert rec["incumbents"][-1] > rec["incumbents"][0] - 1e-9
