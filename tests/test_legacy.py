"""Legacy config-driven API adapter tests (MFGP_ver2023May contract)."""

import numpy as np
import jax.numpy as jnp
import pytest

from fidelityfusion_tpu.models.legacy import LegacyCIGP, LegacyFIDES, LegacyHOGP
from fidelityfusion_tpu.utils.config import make_config, update_dict_with_default


def test_update_dict_with_default_deep():
    default = {"a": {"b": 1, "c": 2}, "d": 3}
    out = update_dict_with_default(default, {"a": {"b": 10}})
    assert out == {"a": {"b": 10, "c": 2}, "d": 3}
    assert default["a"]["b"] == 1  # no mutation


def test_config_dot_access():
    cfg = make_config({"noise": {"init_value": 1.0}}, {"noise": {"init_value": 2.0}})
    assert cfg.noise.init_value == 2.0


def test_legacy_cigp_contract():
    rng = np.random.default_rng(0)
    x = rng.random((30, 1)).astype(np.float32) * 6
    y = np.sin(x).astype(np.float32)
    gp = LegacyCIGP({"input_dim": 1})
    loss0 = float(gp.compute_loss(x, y))
    assert np.isfinite(loss0)
    gp.fit(x, y, max_iter=150, lr=5e-2)
    xt = np.linspace(0, 6, 20).reshape(-1, 1).astype(np.float32)
    mean, var = gp.forward(xt)
    assert mean.shape == (20, 1)
    assert var.shape == (20, 1)
    rmse = float(np.sqrt(np.mean((np.asarray(mean) - np.sin(xt)) ** 2)))
    assert rmse < 0.15


def test_legacy_hogp_contract():
    rng = np.random.default_rng(1)
    x = rng.random((20, 2)).astype(np.float32)
    y = rng.standard_normal((20, 3, 4)).astype(np.float32) * 0.1
    hogp = LegacyHOGP({"input_dim": 2, "output_shape": (3, 4), "kernel": {"ARD": {}}})
    loss = float(hogp.compute_loss(x, y))
    assert np.isfinite(loss)
    mean, var = hogp.forward(x[:5])
    assert mean.shape == (5, 3, 4)
    assert np.all(np.asarray(var) > 0)


def test_legacy_fides_contract():
    rng = np.random.default_rng(2)
    x = (rng.random((25, 1)) * 6).astype(np.float32)
    y = np.sin(x).astype(np.float32)
    fides = LegacyFIDES()
    with pytest.raises(AssertionError):
        fides.compute_loss(x, y)  # must set_fidelity first
    fides.set_fidelity(0, 1, 0, 1)
    fides.fit(x, y, max_iter=150, lr=5e-2)
    mean, var = fides.forward(x[:5])
    assert mean.shape == (5, 1)
    assert np.all(np.asarray(var) > 0)
