"""Pallas kernel correctness tests (interpreter mode on CPU; the same
kernels compile for TPU — benchmarked in bench.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fidelityfusion_tpu.ops.kernels import ARDKernel
from fidelityfusion_tpu.ops.pallas_cholesky import cholesky_blocked
from fidelityfusion_tpu.ops.pallas_gram import gram_se, gram_sigma_ard


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


@pytest.mark.parametrize("n,block", [(128, 64), (256, 64)])
def test_pallas_cholesky_matches_numpy(n, block):
    rng = np.random.default_rng(3)
    A = rng.random((n, 32)).astype(np.float32)
    K = A @ A.T + n * np.eye(n, dtype=np.float32)
    L_ref = np.linalg.cholesky(K)
    L = np.asarray(cholesky_blocked(jnp.asarray(K), block=block, interpret=True))
    np.testing.assert_allclose(L, L_ref, rtol=2e-3, atol=2e-3 * np.abs(L_ref).max())
    # reconstruction check (tighter than elementwise factor comparison)
    np.testing.assert_allclose(L @ L.T, K, rtol=1e-3, atol=1e-3 * K.max())


# ------------------------------------------------ batched whole-VMEM kernels
def _spd(n, seed=0):
    rng = np.random.default_rng(seed)
    A = rng.random((n, 32)).astype(np.float32)
    return A @ A.T + n * np.eye(n, dtype=np.float32)


@pytest.mark.parametrize("n", [128, 256])
def test_cholesky_vmem_matches_numpy(n):
    from fidelityfusion_tpu.ops.pallas_batched import cholesky_vmem

    K = _spd(n)
    L = np.asarray(cholesky_vmem(jnp.asarray(K), interpret=True))
    ref = np.linalg.cholesky(K)
    np.testing.assert_allclose(L, ref, rtol=2e-3, atol=2e-3 * np.abs(ref).max())
    assert np.allclose(np.triu(L, 1), 0.0)


def test_tri_inv_vmem():
    from fidelityfusion_tpu.ops.pallas_batched import tri_inv_vmem

    ref = np.linalg.cholesky(_spd(256, seed=1)).astype(np.float32)
    Li = np.asarray(tri_inv_vmem(jnp.asarray(ref), interpret=True))
    np.testing.assert_allclose(Li @ ref, np.eye(256), atol=1e-3)


def test_mvn_nll_pallas_value_grad_vmap():
    from fidelityfusion_tpu.ops.linalg import mvn_nll_fused
    from fidelityfusion_tpu.ops.pallas_batched import mvn_nll_pallas

    rng = np.random.default_rng(2)
    n, R = 128, 3
    K = _spd(n, seed=2)
    y = rng.standard_normal((n, 2)).astype(np.float32)
    f = lambda S: mvn_nll_pallas(S, jnp.asarray(y), True)
    v = float(f(jnp.asarray(K)))
    vref = float(mvn_nll_fused(jnp.asarray(K), jnp.asarray(y)))
    assert abs(v - vref) / abs(vref) < 1e-4
    g = jax.grad(f)(jnp.asarray(K))
    gref = jax.grad(lambda S: mvn_nll_fused(S, jnp.asarray(y)))(jnp.asarray(K))
    assert float(jnp.abs(g - gref).max() / jnp.abs(gref).max()) < 1e-3
    # vmapped over the restart axis: the intended usage pattern
    KB = jnp.asarray(np.stack([K + i * np.eye(n, dtype=np.float32)
                               for i in range(R)]))
    yB = jnp.asarray(np.stack([y] * R))
    vb = jax.vmap(lambda S, yy: mvn_nll_pallas(S, yy, True))(KB, yB)
    want = [float(mvn_nll_fused(KB[i], jnp.asarray(y))) for i in range(R)]
    np.testing.assert_allclose(np.asarray(vb), want, rtol=1e-4)
