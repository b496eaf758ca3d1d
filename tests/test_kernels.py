"""Unit tests for the kernel zoo against closed-form numpy references.

Formulas follow `GaussianProcess/kernel.py` (see docstrings in
fidelityfusion_tpu/ops/kernels.py for line citations).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from fidelityfusion_tpu.ops import kernels as K


def np_sqdist(a, b):
    return ((a[:, None, :] - b[None, :, :]) ** 2).sum(-1)


@pytest.fixture
def xs(rng):
    return (
        rng.standard_normal((7, 3)).astype(np.float32),
        rng.standard_normal((5, 3)).astype(np.float32),
    )


def test_sq_dist_matches_direct(xs):
    a, b = xs
    got = np.asarray(K.sq_dist(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, np_sqdist(a, b), rtol=1e-4, atol=1e-4)


def test_ard_kernel(xs):
    a, b = xs
    spec = K.ARDKernel()
    p = spec.init_params(3)
    p["length_scales"] = jnp.asarray([0.5, 1.5, 2.0])
    p["signal_variance"] = jnp.asarray([2.0])
    ls = np.abs(np.asarray(p["length_scales"])) + spec.eps
    want = 2.0 * np.exp(-0.5 * np_sqdist(a / ls, b / ls))
    got = np.asarray(spec(p, jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    # diag fast path
    np.testing.assert_allclose(
        np.asarray(spec.diag(p, jnp.asarray(a))),
        np.diagonal(np.asarray(spec(p, jnp.asarray(a), jnp.asarray(a)))),
        rtol=1e-5,
    )


def test_scalar_se_kernel(xs):
    a, b = xs
    spec = K.SquaredExponentialKernel()
    p = spec.init_params(3)
    want = (
        np.exp(1.0) ** 2
        * np.exp(-0.5 * np_sqdist(a, b) / np.exp(1.0) ** 2)
    )
    got = np.asarray(spec(p, jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("nu", [0.5, 1.5, 2.5])
def test_matern_kernel(xs, nu):
    a, b = xs
    spec = K.MaternKernel(nu=nu)
    p = spec.init_params(3)
    d2 = np_sqdist(a, b)
    if nu == 0.5:
        want = np.exp(-np.sqrt(d2))
    elif nu == 1.5:
        want = (1 + np.sqrt(3 * d2)) * np.exp(-np.sqrt(3 * d2))
    else:
        want = (1 + np.sqrt(5 * d2) + 5 / 3 * d2) * np.exp(-np.sqrt(5 * d2))
    got = np.asarray(spec(p, jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_linear_kernel(xs):
    a, b = xs
    spec = K.LinearKernel()
    p = spec.init_params(3)
    want = a @ b.T
    got = np.asarray(spec(p, jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_sum_product_composition(xs):
    a, b = xs
    s = K.SumKernel(K.ARDKernel(), K.LinearKernel())
    pr = K.ProductKernel(K.ARDKernel(), K.LinearKernel())
    ps, pp = s.init_params(3), pr.init_params(3)
    ka = np.asarray(K.ARDKernel()(ps["k1"], jnp.asarray(a), jnp.asarray(b)))
    kl = np.asarray(K.LinearKernel()(ps["k2"], jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(
        np.asarray(s(ps, jnp.asarray(a), jnp.asarray(b))), ka + kl, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(pr(pp, jnp.asarray(a), jnp.asarray(b))), ka * kl, rtol=1e-4, atol=1e-5
    )


def test_psd_property(rng):
    """Gram matrices must be PSD (+jitter) for all stationary kernels."""
    x = jnp.asarray(rng.standard_normal((40, 4)), jnp.float32)
    for spec in [
        K.ARDKernel(),
        K.SquaredExponentialKernel(),
        K.MaternKernel(nu=1.5),
        K.RationalQuadraticKernel(),
    ]:
        p = spec.init_params(4)
        gram = np.asarray(spec(p, x, x))
        np.testing.assert_allclose(gram, gram.T, atol=1e-5)
        w = np.linalg.eigvalsh(gram + 1e-5 * np.eye(40))
        assert w.min() > 0, f"{spec} produced non-PSD Gram"


def test_mc_fidelity_kernel_deterministic():
    """MC fidelity kernel must be a deterministic pure function of params
    (the reference reseeds the global RNG per call; we use fixed draws)."""
    spec = K.MCFidelityKernel(base=K.ARDKernel(), lf=0.0, hf=1.0)
    p = spec.init_params(2)
    x = jnp.ones((3, 2))
    k1 = np.asarray(spec(p, x, x))
    k2 = np.asarray(spec(p, x, x))
    np.testing.assert_array_equal(k1, k2)
    # factor is positive and scales the base kernel
    assert np.all(k1 > 0)


def test_trainable_mask_freezes_mc_samples():
    spec = K.MCFidelityKernel(base=K.ARDKernel())
    p = spec.init_params(2)
    mask = K.trainable_mask(spec, p)
    assert mask["b"] is True or mask["b"] == True  # noqa: E712
    flat = [m for m in np.asarray(mask["_z"][0]).ravel()] if hasattr(mask["_z"][0], "ravel") else []
    import jax

    leaves = jax.tree_util.tree_leaves(mask["_z"])
    assert all(leaf == False for leaf in leaves)  # noqa: E712
