"""ResPCA: PCA-family dimensionality reduction for high-dim outputs.

TPU-native re-design of `FidelityFusion_Models/ResPCA.py:11-177`
(Deep-Coregionalization-style companions): energy-rank-truncated SVD
bases for flattened field outputs, with four variants —

  * `PCA`           one basis over one dataset (`ResPCA.py:17-47`)
  * `ListPCA`       independent bases per fidelity (`ResPCA.py:50-77`)
  * `ResPCA`        shared low-fid basis + residual bases per fidelity
                    (`ResPCA.py:80-138`)
  * `ResPCAMF`      residual PCA with *different sample counts* per
                    fidelity — residual computed on the overlapping head
                    samples (`ResPCA.py:141-177`)

All transforms are jnp (SVD on the MXU); energy threshold semantics match
the reference (smallest rank capturing ``energy`` of total variance).
"""

from __future__ import annotations

from typing import List, Sequence

import jax.numpy as jnp
import numpy as np


def _energy_rank(s: jnp.ndarray, energy: float) -> int:
    e = np.cumsum(np.asarray(s) ** 2)
    e = e / e[-1]
    return int(np.searchsorted(e, energy) + 1)


class PCA:
    """Mean-centered truncated-SVD basis: y (n, D) <-> z (n, r)."""

    def __init__(self, y: jnp.ndarray, energy: float = 0.99, rank: int = None):
        y = jnp.asarray(y, jnp.float32).reshape(len(y), -1)
        self.mean = jnp.mean(y, axis=0, keepdims=True)
        u, s, vt = jnp.linalg.svd(y - self.mean, full_matrices=False)
        r = rank if rank is not None else _energy_rank(s, energy)
        self.rank = r
        self.basis = vt[:r]  # (r, D)

    def project(self, y: jnp.ndarray) -> jnp.ndarray:
        y = jnp.asarray(y, jnp.float32).reshape(len(y), -1)
        return (y - self.mean) @ self.basis.T

    def recover(self, z: jnp.ndarray) -> jnp.ndarray:
        return z @ self.basis + self.mean


class ListPCA:
    """Independent PCA per fidelity (`ResPCA.py:50-77`)."""

    def __init__(self, y_list: Sequence[jnp.ndarray], energy: float = 0.99):
        self.pcas = [PCA(y, energy) for y in y_list]

    def project(self, y_list: Sequence[jnp.ndarray]) -> List[jnp.ndarray]:
        return [p.project(y) for p, y in zip(self.pcas, y_list)]

    def recover(self, z_list: Sequence[jnp.ndarray]) -> List[jnp.ndarray]:
        return [p.recover(z) for p, z in zip(self.pcas, z_list)]


class ResPCA:
    """Shared lowest-fidelity basis + per-fidelity residual bases
    (`ResPCA.py:80-138`): higher-fidelity y is encoded as (z_base,
    z_residual) where the residual is y - recover(base_project(y))."""

    def __init__(self, y_list: Sequence[jnp.ndarray], energy: float = 0.99):
        self.base = PCA(y_list[0], energy)
        self.res_pcas = []
        for y in y_list[1:]:
            approx = self.base.recover(self.base.project(y))
            y_flat = jnp.asarray(y, jnp.float32).reshape(len(y), -1)
            self.res_pcas.append(PCA(y_flat - approx, energy))

    def project(self, y_list: Sequence[jnp.ndarray]):
        out = [self.base.project(y_list[0])]
        for y, rp in zip(y_list[1:], self.res_pcas):
            approx = self.base.recover(self.base.project(y))
            y_flat = jnp.asarray(y, jnp.float32).reshape(len(y), -1)
            out.append(
                jnp.concatenate(
                    [self.base.project(y), rp.project(y_flat - approx)], axis=1
                )
            )
        return out

    def recover(self, z_list: Sequence[jnp.ndarray]):
        out = [self.base.recover(z_list[0])]
        rb = self.base.rank
        for z, rp in zip(z_list[1:], self.res_pcas):
            out.append(self.base.recover(z[:, :rb]) + rp.recover(z[:, rb:]))
        return out


class ResPCAMF:
    """Residual PCA with different sample counts per fidelity
    (`ResPCA.py:141-177`): fidelity i's residual basis is fitted on the
    first min(n_i, n_{i-1}) samples shared with the previous fidelity."""

    def __init__(self, y_list: Sequence[jnp.ndarray], energy: float = 0.99):
        self.base = PCA(y_list[0], energy)
        self.res_pcas = []
        prev = jnp.asarray(y_list[0], jnp.float32).reshape(len(y_list[0]), -1)
        for y in y_list[1:]:
            y_flat = jnp.asarray(y, jnp.float32).reshape(len(y), -1)
            n = min(len(prev), len(y_flat))
            res = y_flat[:n] - prev[:n]
            self.res_pcas.append(PCA(res, energy))
            prev = y_flat

    def project_residuals(self, y_list: Sequence[jnp.ndarray]):
        out = [self.base.project(y_list[0])]
        prev = jnp.asarray(y_list[0], jnp.float32).reshape(len(y_list[0]), -1)
        for y, rp in zip(y_list[1:], self.res_pcas):
            y_flat = jnp.asarray(y, jnp.float32).reshape(len(y), -1)
            n = min(len(prev), len(y_flat))
            out.append(rp.project(y_flat[:n] - prev[:n]))
            prev = y_flat
        return out
