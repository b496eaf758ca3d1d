"""ResPCA family tests: round-trip reconstruction quality (the reference's
__main__ R^2 assertions, `ResPCA.py:182-310`)."""

import numpy as np
import jax.numpy as jnp

from fidelityfusion_tpu.models.respca import PCA, ListPCA, ResPCA, ResPCAMF


def _fields(rng, n, d1, d2, rank=3):
    U = rng.standard_normal((n, rank))
    B = rng.standard_normal((rank, d1 * d2))
    return (U @ B).reshape(n, d1, d2)


def test_pca_roundtrip(rng):
    y = _fields(rng, 30, 6, 5)
    pca = PCA(y, energy=0.999)
    z = pca.project(y)
    back = np.asarray(pca.recover(z)).reshape(30, 6, 5)
    assert pca.rank <= 4
    np.testing.assert_allclose(back, y, rtol=1e-3, atol=1e-3)


def test_pca_energy_truncation(rng):
    y = _fields(rng, 40, 8, 8, rank=6)
    full = PCA(y, energy=0.9999)
    truncated = PCA(y, rank=2)
    assert truncated.rank == 2
    assert full.rank >= truncated.rank


def test_list_pca(rng):
    ys = [_fields(rng, 25, 4, 4), _fields(rng, 25, 6, 6)]
    lp = ListPCA(ys, energy=0.999)
    zs = lp.project(ys)
    backs = lp.recover(zs)
    for y, b in zip(ys, backs):
        np.testing.assert_allclose(
            np.asarray(b).reshape(y.shape), y, rtol=1e-3, atol=1e-3
        )


def test_res_pca_roundtrip(rng):
    base = _fields(rng, 30, 5, 5)
    ys = [base, base + 0.1 * _fields(rng, 30, 5, 5)]
    rp = ResPCA(ys, energy=0.999)
    zs = rp.project(ys)
    backs = rp.recover(zs)
    np.testing.assert_allclose(
        np.asarray(backs[1]).reshape(30, 5, 5), ys[1], rtol=1e-2, atol=1e-2
    )


def test_res_pca_mf_different_counts(rng):
    ys = [_fields(rng, 30, 4, 4), _fields(rng, 20, 4, 4), _fields(rng, 12, 4, 4)]
    rpm = ResPCAMF(ys, energy=0.99)
    zs = rpm.project_residuals(ys)
    assert len(zs) == 3
    assert zs[1].shape[0] == 20 and zs[2].shape[0] == 12
