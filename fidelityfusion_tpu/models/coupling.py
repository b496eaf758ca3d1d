"""Cross-fidelity coupling operators.

TPU-native re-design of the reference coupling layer:
  * rho-residual coupling (`MFGP_ver2023May/multiscale_coupling/Residual.py:9-34`)
    lives directly in the AR/ResGP models (scalar ops).
  * ``TensorLinear`` re-designs `GaussianProcess/gp_computation_pack.py:138-158`
    (`Tensor_linear`) and `multiscale_coupling/matrix.py:49-91`
    (`Matrix_Mapping`): per-output-mode linear maps lifting a low-fidelity
    tensor field to the high-fidelity shape, initialized as a
    linear-interpolation identity.  The reference's forward loop overwrites
    ``y`` from the original input each iteration so only the *last* mode map
    is ever applied (`gp_computation_pack.py:155-158`); here the mode
    products accumulate correctly (SURVEY.md §7 calls out this fix).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import numpy as np
import jax.numpy as jnp

from fidelityfusion_tpu.ops.kron import mode_dot


def interp_identity(l_dim: int, h_dim: int) -> np.ndarray:
    """(l_dim, h_dim) linear-interpolation matrix mapping a length-l_dim
    signal onto a length-h_dim grid; identity when shapes match.

    Equivalent in spirit to the reference's bilinear-interpolated identity
    init (`gp_computation_pack.py:146-152`).
    """
    if l_dim == h_dim:
        return np.eye(l_dim, dtype=np.float32)
    # sample positions of the h grid inside the l grid
    pos = np.linspace(0, l_dim - 1, h_dim)
    lo = np.floor(pos).astype(int)
    hi = np.minimum(lo + 1, l_dim - 1)
    w = (pos - lo).astype(np.float32)
    M = np.zeros((l_dim, h_dim), dtype=np.float32)
    M[lo, np.arange(h_dim)] += 1.0 - w
    M[hi, np.arange(h_dim)] += w
    return M


@dataclasses.dataclass(frozen=True)
class TensorLinear:
    """Trainable per-mode linear lift from l_shape to h_shape."""

    l_shape: Tuple[int, ...]
    h_shape: Tuple[int, ...]

    def init_params(self):
        return {
            "maps": [
                jnp.asarray(interp_identity(l, h))
                for l, h in zip(self.l_shape, self.h_shape)
            ]
        }

    def apply(self, params, x: jnp.ndarray) -> jnp.ndarray:
        """x: (n, l_1, ..., l_M) -> (n, h_1, ..., h_M).

        Mode m of the sample tensor is axis m+1 (axis 0 is the batch).
        Accumulates over *all* modes (fixing the reference bug where only
        the final mode map was applied).
        """
        y = x
        for m, M in enumerate(params["maps"]):
            y = mode_dot(y, M.T, m + 1)
        return y

    __call__ = apply
