"""Experiment-harness tests: metrics, zoo loader, one tiny sweep cell."""

import os

import numpy as np
import pytest

from fidelityfusion_tpu.experiments.load_mfdata import (
    all_fidelity_pairs,
    load_data,
    parse_name,
)
from fidelityfusion_tpu.experiments.metrics import calculate_metrix, r2, rmse
from fidelityfusion_tpu.experiments.sweep import run_single, run_sweep


def test_metrics_closed_form():
    a = np.array([1.0, 2.0, 3.0])
    p = np.array([1.0, 2.0, 3.0])
    assert rmse(a, p) == 0.0
    assert r2(a, p) == 1.0
    m = calculate_metrix(a, p, np.ones(3))
    assert m["rmse"] == 0.0 and m["r2"] == 1.0
    assert np.isfinite(m["nll"])


def test_parse_name():
    assert parse_name("forrester12") == ("forrester", 0, 1)
    assert parse_name("maolin512") == ("maolin5", 0, 1)
    assert parse_name("tl112") == ("tl1", 0, 1)
    with pytest.raises((ValueError, KeyError)):
        parse_name("nosuchfn12")


def test_all_fidelity_pairs():
    pairs = all_fidelity_pairs("forrester")
    assert "forrester12" in pairs and "forrester34" in pairs
    assert len(pairs) == 6  # C(4,2)


def test_load_data_subset_structure():
    d = load_data("tl112", n_train_low=30, n_train_high=8, n_test=20, subset=True)
    assert d["x_low"].shape == (30, 1)
    assert d["x_high"].shape == (8, 1)
    # subset: every high-fidelity x appears in the low-fidelity set
    for row in d["x_high"]:
        assert any(np.allclose(row, r) for r in d["x_low"])


def test_load_data_nonsubset():
    d = load_data("tl112", n_train_low=30, n_train_high=8, subset=False)
    overlap = sum(
        any(np.allclose(row, r) for r in d["x_low"]) for row in d["x_high"]
    )
    assert overlap < 8  # independent draws


def test_run_single_cell(tmp_path):
    row = run_single(
        "AR", "tl112", seed=0, n_high=8, n_low=30, n_test=30,
        max_iter=60, n_restarts=2,
    )
    assert set(row) >= {"r2", "rmse", "nll", "nrmse", "time"}
    assert row["rmse"] < 5.0  # sanity; tl1 scale is O(10)


def test_run_sweep_writes_csv(tmp_path):
    rows = run_sweep(
        methods=["ResGP"],
        datasets=["tl112"],
        seeds=[0],
        n_high_grid=[6, 10],
        outdir=str(tmp_path),
        n_low=24,
        n_test=20,
        max_iter=40,
        n_restarts=2,
    )
    assert len(rows) == 2
    path = tmp_path / "tl112" / "ResGP_seed_0.csv"
    assert path.exists()
    text = path.read_text()
    # the reference's exact column set (`exp_non_aligned.py:53`)
    assert text.startswith("train_sample_num,rmse,nrmse,r2,nll,time")


def test_run_single_gar_cigar_scalar():
    """GAR/CIGAR on scalar zoo data with (1,) output shapes — the
    reference's exp_non_aligned protocol runs all five methods including
    GAR/CIGAR on the scalar zoo (`exp_non_aligned.py:40-45,95-96`)."""
    for method in ("GAR", "CIGAR"):
        row = run_single(
            method, "tl112", seed=0, n_high=8, n_low=24, n_test=20,
            max_iter=40, n_restarts=2,
        )
        assert np.isfinite(row["rmse"]), (method, row)
        assert row["rmse"] < 10.0, (method, row)


def test_run_gar_field_sweep_variants(tmp_path):
    """Tensor-field GAR sweep: one tiny cell per variant writes the
    reference CSV format and produces finite errors."""
    from fidelityfusion_tpu.experiments.sweep import run_gar_field_sweep

    for variant in ("aligned", "non-aligned", "non-subset"):
        rows = run_gar_field_sweep(
            methods=("CIGAR",), datasets=("poisson",), seeds=(0,),
            n_high_grid=(6,), variant=variant, n_low=16, n_test=8,
            resolutions=(4, 6), outdir=str(tmp_path), max_iter=30,
            n_restarts=2,
        )
        assert len(rows) == 1
        assert np.isfinite(rows[0]["rmse"]), (variant, rows)
        path = tmp_path / f"poisson_{variant}" / "CIGAR_seed_0.csv"
        assert path.read_text().startswith(
            "train_sample_num,rmse,nrmse,r2,nll,time"
        )


def test_run_car_sweep_writes_csv(tmp_path):
    """CAR train-size protocol (`Experiments/CAR_Subset/exp_car.py`):
    one CSV per (method, seed) with a train_sample_num column."""
    from fidelityfusion_tpu.experiments.sweep import run_car_sweep

    rows = run_car_sweep(
        methods=("AR",), seeds=(0,), train_sizes=(16, 32),
        outdir=str(tmp_path), max_iter=40, n_restarts=2,
    )
    assert len(rows) == 2
    path = tmp_path / "sample_data" / "ar_0.75_seed_0.csv"
    assert path.exists()
    assert path.read_text().startswith(
        "train_sample_num,rmse,nrmse,r2,nll,time"
    )
    assert all(np.isfinite(r["rmse"]) for r in rows)


def test_run_car_cost_sweep_writes_csv(tmp_path):
    """CAR cost protocol (`Experiments/CAR_Cost/exp_car.py`): random
    non-nested cells with a cost column."""
    from fidelityfusion_tpu.experiments.sweep import run_car_cost_sweep

    rows = run_car_cost_sweep(
        methods=("ResGP",), start_seeds=(1,), n_cells=2,
        outdir=str(tmp_path), max_iter=40, n_restarts=2,
    )
    assert len(rows) == 2
    path = tmp_path / "sample_data" / "resgp_seed_1.csv"
    assert path.exists()
    assert path.read_text().startswith("cost,rmse,r2,nll,nrmse,time")
    assert all(r["cost"] >= 1 for r in rows)


def test_sharded_seed_sweep():
    """The seed axis trains data-parallel over the virtual mesh and the
    metric rows come back finite and reasonable."""
    from fidelityfusion_tpu.experiments.sharded_sweep import run_sharded_seed_sweep

    rows = run_sharded_seed_sweep(
        "tl112", seeds=[0, 1, 2, 3, 4, 5, 6, 7], n_high=12, n_low=48,
        n_test=32, steps=150,
    )
    assert len(rows) == 8
    for r in rows:
        assert np.isfinite(r["rmse"])
    # tl1 targets span ~[-10, 17]; a fitted AR should do much better than std
    assert np.median([r["rmse"] for r in rows]) < 2.0
