"""CLI demo smoke tests (`fidelityfusion_tpu/demo.py`).

The reference's de-facto integration suite is `python mfgp_demo.py <MODEL>`
over the model names (`README.md:62-70`, SURVEY.md §4.3); this covers the
equivalent entry point's plumbing for each demo branch: vector cascade,
single-GP, tensor-output, and the nonsubset imputation path.
"""

import numpy as np

from fidelityfusion_tpu import demo


def _run(argv):
    m = demo.main(argv + ["--cpu"])
    assert set(m) == {"r2", "rmse", "nll", "nrmse"}
    assert all(np.isfinite(v) for v in m.values())
    return m


def test_demo_ar_vector_branch():
    m = _run(["AR", "--iters", "60", "--restarts", "1"])
    # plumbing smoke (few iters/restarts); full-budget accuracy is
    # asserted in test_ar.py (rmse < 0.1 at 300 iters, 4 restarts)
    assert m["rmse"] < 0.5


def test_demo_cigp_single_gp_branch():
    m = _run(["CIGP", "--iters", "60"])
    assert m["rmse"] < 0.5


def test_demo_hogp_tensor_branch():
    m = _run(["HOGP", "--iters", "40"])
    assert m["rmse"] < 1.0


def test_demo_nonsubset_branch():
    m = _run(["ResGP", "--nonsubset", "--iters", "60", "--restarts", "1"])
    assert m["rmse"] < 0.5
