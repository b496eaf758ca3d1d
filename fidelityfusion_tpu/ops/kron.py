"""Kronecker / tensor-algebra primitives for high-order GPs.

TPU-native replacement for the reference's tensorly usage
(`GaussianProcess/hogp_simple.py:15-19,87-102`): mode products are plain
MXU matmuls via ``jnp.tensordot`` + ``moveaxis`` (XLA fuses the chain),
and per-mode symmetric eigendecompositions use ``jnp.linalg.eigh``.
The Kronecker-structured covariance ``K_0 (x) K_1 (x) ... (x) K_M`` is
never materialized — everything runs through per-mode factors.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp


def mode_dot(tensor: jnp.ndarray, matrix: jnp.ndarray, mode: int) -> jnp.ndarray:
    """n-mode product: contract ``matrix``'s second axis with ``tensor``'s
    ``mode`` axis (tensorly.tenalg.mode_dot semantics)."""
    moved = jnp.tensordot(matrix, tensor, axes=(1, mode))
    return jnp.moveaxis(moved, 0, mode)


def multi_mode_dot(
    tensor: jnp.ndarray, matrices: Sequence[jnp.ndarray], modes: Sequence[int] = None
) -> jnp.ndarray:
    """Chain of mode products over all (or the given) modes."""
    if modes is None:
        modes = range(len(matrices))
    out = tensor
    for mat, mode in zip(matrices, modes):
        out = mode_dot(out, mat, mode)
    return out


def eigh_pairs(K: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric eigendecomposition, (values, vectors).

    Replaces `hogp_simple.py:15-19` (torch.linalg.eigh, UPLO='U'): jnp's
    eigh uses the lower triangle; K is symmetric by construction so the
    result is identical up to sign/order conventions.
    """
    w, v = jnp.linalg.eigh(K)
    return w, v


def rank1_tucker(factors: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """Outer product of vectors (eigenvalue tensor assembly).

    Equivalent to `tucker_to_tensor((ones, [lam_m[:, None]]))` at
    `hogp_simple.py:93-95`: result[i0, ..., iM] = prod_m factors[m][i_m].
    """
    out = jnp.asarray(factors[0]).reshape(-1)
    for f in factors[1:]:
        out = out[..., None] * jnp.asarray(f).reshape(
            (1,) * out.ndim + (-1,)
        )
    return out
