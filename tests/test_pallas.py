"""Pallas-artifact correctness tests (interpreter mode on CPU) and
fused-SE numeric contracts.

ALL Pallas kernels are retired from the product (benchmarks/retired/):
the Cholesky kernels lost to XLA over rounds 1-2, and the gram kernel's
round-2 win was a bf16-accuracy artifact — fixed to f32 it ties
standalone and loses inside the fused NLML scan (see
benchmarks/retired/README.md).  The interpret-mode tests below guard the
retired gram artifact; the fused-SE tests guard the production path."""

import numpy as np
import jax
import jax.numpy as jnp

from fidelityfusion_tpu.ops.kernels import ARDKernel
from benchmarks.retired.pallas_gram import gram_se, gram_sigma_ard


def test_pallas_gram_matches_kernel():
    rng = np.random.default_rng(0)
    n, d = 256, 4
    x = jnp.asarray(rng.random((n, d)), jnp.float32)
    spec = ARDKernel()
    p = spec.init_params(d)
    want = np.asarray(spec.apply(p, x, x))
    ls = jnp.abs(p["length_scales"]) + spec.eps
    got = np.asarray(
        gram_se(x / ls, x / ls, jnp.abs(p["signal_variance"][0]),
                block=128, interpret=True)
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_pallas_gram_diag_add():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.random((128, 3)), jnp.float32)
    spec = ARDKernel()
    p = spec.init_params(3)
    noise = 0.123
    got = np.asarray(
        gram_sigma_ard(p, x, noise, jitter=1e-6, block=128, interpret=True)
    )
    want = np.asarray(spec.apply(p, x, x)) + (noise + 1e-6) * np.eye(128)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_pallas_gram_rectangular():
    rng = np.random.default_rng(2)
    x1 = jnp.asarray(rng.random((256, 2)), jnp.float32)
    x2 = jnp.asarray(rng.random((128, 2)), jnp.float32)
    spec = ARDKernel()
    p = spec.init_params(2)
    ls = jnp.abs(p["length_scales"]) + spec.eps
    got = np.asarray(
        gram_se(x1 / ls, x2 / ls, jnp.abs(p["signal_variance"][0]),
                block=128, interpret=True)
    )
    want = np.asarray(spec.apply(p, x1, x2))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_pallas_gram_near_duplicate_rows():
    """The cancellation fixture: near-duplicate inputs make the quadratic
    expansion n1 + n2 - 2 x1.x2 catastrophically cancel unless the cross
    dot is full f32 (the round-2 TPU precision finding).  The production
    gram must keep d2 >= 0 and K <= sv with no NaNs on this fixture."""
    rng = np.random.default_rng(3)
    base = rng.random((64, 4)).astype(np.float32) * 100.0  # large norms
    x = np.concatenate([base, base + 1e-4, base - 1e-4, base * (1 + 1e-6)])
    x = jnp.asarray(x, jnp.float32)
    got = np.asarray(gram_se(x, x, jnp.asarray(2.0), block=128,
                             interpret=True))
    assert np.all(np.isfinite(got))
    assert got.max() <= 2.0 + 1e-4
    # diagonal must be exactly sv (d2 clamped at 0)
    np.testing.assert_allclose(np.diagonal(got), 2.0, rtol=1e-6)


def test_se_sigma_parts_matches_retired_pallas_gram():
    """The retired Pallas gram (interpret mode) and the production XLA
    `_se_sigma_parts` build the same Sigma to f32 tolerance — the
    correctness record backing the retirement decision (the kernel was
    retired for SPEED inside the fused scan, not accuracy)."""
    from fidelityfusion_tpu.ops import fused_se
    from benchmarks.retired.pallas_gram import gram_se as _gram_se

    rng = np.random.default_rng(4)
    n = 256
    x = jnp.asarray(rng.random((n, 3)), jnp.float32)
    params = {
        "kernel": {
            "length_scale": jnp.asarray([0.3], jnp.float32),
            "signal_variance": jnp.asarray([0.2], jnp.float32),
        },
        "log_beta": jnp.asarray([1.0], jnp.float32),
    }
    K_x, c_x, Sigma_x = fused_se._se_sigma_parts(params, x, 1e-6)

    t = params["kernel"]["length_scale"][0]
    u = params["kernel"]["signal_variance"][0]
    xs = x * jnp.exp(-t)
    Sigma_p = _gram_se(xs, xs, jnp.exp(2.0 * u), diag_add=c_x, block=128,
                       interpret=True)
    np.testing.assert_allclose(
        np.asarray(Sigma_p), np.asarray(Sigma_x), rtol=2e-5, atol=2e-6
    )


def test_se_nlml_grad_unchanged_after_d2_drop():
    """The backward now recovers d2 e^{-2t} from K (log identity) instead
    of storing the n^2 d2 residual — gradients must still match autodiff
    through the plain NLML."""
    from fidelityfusion_tpu.ops.fused_se import se_nlml
    from fidelityfusion_tpu.ops.kernels import SquaredExponentialKernel
    from fidelityfusion_tpu.ops.linalg import mvn_nll_fused

    rng = np.random.default_rng(5)
    n, d = 96, 2
    x = jnp.asarray(rng.random((n, 3)) * 3.0, jnp.float32)
    y = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    params = {
        "kernel": {
            "length_scale": jnp.asarray([0.4], jnp.float32),
            "signal_variance": jnp.asarray([0.1], jnp.float32),
        },
        "log_beta": jnp.asarray([0.7], jnp.float32),
    }
    spec = SquaredExponentialKernel()

    def ref_nll(p):
        K = spec.apply(p["kernel"], x, x)
        Sigma = K + (jnp.exp(-p["log_beta"][0]) + 1e-6) * jnp.eye(n)
        return mvn_nll_fused(Sigma, y)

    v1, g1 = jax.value_and_grad(lambda p: se_nlml(p, x, y))(params)
    v2, g2 = jax.value_and_grad(ref_nll)(params)
    assert abs(float(v1) - float(v2)) / abs(float(v2)) < 1e-5
    for k in ("length_scale", "signal_variance"):
        a = float(g1["kernel"][k][0])
        b = float(g2["kernel"][k][0])
        assert abs(a - b) / (abs(b) + 1e-8) < 2e-3, (k, a, b)
    a, b = float(g1["log_beta"][0]), float(g2["log_beta"][0])
    assert abs(a - b) / (abs(b) + 1e-8) < 2e-3, (a, b)
