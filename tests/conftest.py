"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-device sharding tests use
``XLA_FLAGS=--xla_force_host_platform_device_count=8`` — a capability the
reference never had (it is single-process torch; SURVEY.md §4).
"""

import os

# Force CPU: the session environment pins JAX_PLATFORMS to the TPU plugin,
# so setdefault would silently run the whole suite over the device tunnel.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Plugins (e.g. jaxtyping's pytest hook) import jax BEFORE this conftest
# runs, capturing JAX_PLATFORMS from the environment.  Overriding the
# config still works as long as no backend has been initialized.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def toy_sin_data():
    """Replica of the seeded 3-fidelity toy sin fixture used by every
    reference model demo (`AR_autoRegression.py:143-170`): nested-subset
    x grids, y_f(x) = sin(x) - c_f sin(2x) + U(-0.05, 0.05)."""
    rng = np.random.default_rng(1)
    x_all = rng.random((500, 1)) * 20
    idx_low = np.sort(rng.permutation(500)[:300])
    idx_h1 = np.sort(rng.permutation(500)[:300])
    idx_h2 = np.sort(rng.permutation(500)[:250])
    x_low, x_h1, x_h2 = x_all[idx_low], x_all[idx_h1], x_all[idx_h2]
    noise = lambda n: rng.random((n, 1)) * 0.1 - 0.05
    y_low = np.sin(x_low) - 0.5 * np.sin(2 * x_low) + noise(300)
    y_h1 = np.sin(x_h1) - 0.3 * np.sin(2 * x_h1) + noise(300)
    y_h2 = np.sin(x_h2) + noise(250)
    x_test = np.linspace(0, 20, 100).reshape(-1, 1)
    y_test = np.sin(x_test)
    return {
        "train": [(x_low, y_low), (x_h1, y_h1), (x_h2, y_h2)],
        "test": (x_test, y_test),
    }
