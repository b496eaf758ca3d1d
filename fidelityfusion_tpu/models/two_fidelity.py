"""Two-fidelity pedagogic variants (compat surface).

The reference ships hardcoded two-fidelity versions of AR / NAR / ResGP /
GAR under `FidelityFusion_Models/two_fidelity_models/` with a
train-data-caching GP and a module-level `find_subsets_and_indexes`
helper (`two_fidelity_models/AR_autoRegression.py:15-104`,
`NAR_NonlinearAR.py:11-76`, `ResGP.py:10-85`,
`GAR_GeneralizedAutoAR.py:13-110`).  SURVEY.md §2.3 notes they are
superseded by the N-fidelity stack; this module keeps their *API shape*
available — `Model(); train_X_twofidelity(model, x_train, y_train);
model.forward(x_test)` — as thin wrappers that build a data manager from
the `(x_train, y_train)` lists and delegate to the N-fidelity models, so
tutorial code written against the reference's pedagogic layer ports
one-for-one while running the TPU-native path underneath.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

from fidelityfusion_tpu.models.ar import AR, train_AR
from fidelityfusion_tpu.models.data_manager import MultiFidelityDataManager
from fidelityfusion_tpu.models.gar import GAR, train_GAR
from fidelityfusion_tpu.models.nar import NAR, train_NAR
from fidelityfusion_tpu.models.resgp import ResGP, train_ResGP
from fidelityfusion_tpu.ops.kernels import SquaredExponentialKernel


def find_subsets_and_indexes(x_low, x_high):
    """Overlap rows between two fidelity input sets and their indexes
    (`two_fidelity_models/AR_autoRegression.py:15-22`; the reference
    flattens and uses `torch.isin`, which is only correct for 1-D inputs —
    this version matches whole rows for any input dimension).

    Returns ``(subset_x, subset_indexes_low, subset_indexes_high)``.
    """
    xl = np.asarray(x_low)
    xh = np.asarray(x_high)
    # 1-D inputs are n scalar design points (the reference's torch.isin
    # usage), i.e. column vectors — NOT a single n-dim row.
    xl = xl.reshape(-1, 1) if xl.ndim == 1 else np.atleast_2d(xl)
    xh = xh.reshape(-1, 1) if xh.ndim == 1 else np.atleast_2d(xh)
    if xl.shape[1] != xh.shape[1]:
        raise ValueError(
            f"x_low and x_high have incompatible input dims "
            f"{xl.shape[1]} vs {xh.shape[1]}")
    eq = (xl[:, None, :] == xh[None, :, :]).all(-1)
    idx_low, idx_high = np.nonzero(eq)
    # keep first match per low row, reference semantics (unique designs)
    _, first = np.unique(idx_low, return_index=True)
    idx_low, idx_high = idx_low[first], idx_high[first]
    return xl[idx_low], idx_low, idx_high


class _TwoFidelityBase:
    """Shared wrapper plumbing: build a 2-fidelity data manager from the
    reference's ``(x_train, y_train)`` list convention, train the wrapped
    N-fidelity model, and serve `forward(x_test)` from the cached data
    manager (the pedagogic stack caches train data inside the model,
    `two_fidelity_models/base/gp_basic.py:38-39`)."""

    model = None  # wrapped N-fidelity model, set by subclass __init__

    def _fit(self, x_train: Sequence, y_train: Sequence, train_fn,
             max_iter: int, lr_init: float, **kw):
        self.data_manager = MultiFidelityDataManager(
            [
                {"raw_fidelity_name": "0", "fidelity_indicator": 0,
                 "X": np.asarray(x_train[0], np.float32),
                 "Y": np.asarray(y_train[0], np.float32)},
                {"raw_fidelity_name": "1", "fidelity_indicator": 1,
                 "X": np.asarray(x_train[1], np.float32),
                 "Y": np.asarray(y_train[1], np.float32)},
            ]
        )
        return train_fn(self.model, self.data_manager,
                        max_iter=max_iter, lr_init=lr_init, **kw)

    def forward(self, x_test) -> Tuple:
        if getattr(self, "data_manager", None) is None:
            raise RuntimeError("train the two-fidelity model before forward()")
        return self.model.forward(self.data_manager, x_test)

    __call__ = forward


class ARTwoFidelity(_TwoFidelityBase):
    """`autoRegression_twofidelity` (`two_fidelity_models/AR_autoRegression.py:25-49`)."""

    def __init__(self, rho_init: float = 1.0, input_dim: int = 1,
                 kernels: Optional[Sequence] = None):
        ks = list(kernels) if kernels else [SquaredExponentialKernel()] * 2
        self.model = AR(2, ks, rho_init=rho_init, input_dim=input_dim)

    @property
    def rho(self):
        return self.model.params["rho"][0]


class NARTwoFidelity(_TwoFidelityBase):
    """`NAR_twofidelity` (`two_fidelity_models/NAR_NonlinearAR.py:20-37`)."""

    def __init__(self, input_dim: int = 1, kernels: Optional[Sequence] = None):
        ks = list(kernels) if kernels else [SquaredExponentialKernel()] * 2
        self.model = NAR(2, ks, input_dim=input_dim)


class ResGPTwoFidelity(_TwoFidelityBase):
    """`ResGP_twofidelity` (`two_fidelity_models/ResGP.py:20-41`)."""

    def __init__(self, input_dim: int = 1, kernels: Optional[Sequence] = None):
        ks = list(kernels) if kernels else [SquaredExponentialKernel()] * 2
        self.model = ResGP(2, ks, input_dim=input_dim)


class GARTwoFidelity(_TwoFidelityBase):
    """`GAR_twofidelity(l_shape, h_shape)`
    (`two_fidelity_models/GAR_GeneralizedAutoAR.py:26-72`)."""

    def __init__(self, l_shape: Tuple[int, ...], h_shape: Tuple[int, ...],
                 input_dim: int = 1, kernels: Optional[Sequence] = None):
        ks = list(kernels) if kernels else [SquaredExponentialKernel()] * 2
        self.model = GAR(2, ks, [tuple(l_shape), tuple(h_shape)],
                         input_dim=input_dim)


def train_AR_twofidelity(ARmodel: ARTwoFidelity, x_train, y_train,
                         max_iter: int = 100, lr_init: float = 1e-1, **kw):
    """`two_fidelity_models/AR_autoRegression.py:51-104` contract."""
    return ARmodel._fit(x_train, y_train, train_AR, max_iter, lr_init, **kw)


def train_NAR_twofidelity(NARmodel: NARTwoFidelity, x_train, y_train,
                          max_iter: int = 100, lr_init: float = 1e-1, **kw):
    """`two_fidelity_models/NAR_NonlinearAR.py:39-76` contract."""
    return NARmodel._fit(x_train, y_train, train_NAR, max_iter, lr_init, **kw)


def train_ResGP_twofidelity(ResGPmodel: ResGPTwoFidelity, x_train, y_train,
                            max_iter: int = 100, lr_init: float = 1e-1, **kw):
    """`two_fidelity_models/ResGP.py:43-85` contract."""
    return ResGPmodel._fit(x_train, y_train, train_ResGP, max_iter, lr_init,
                           **kw)


def train_GAR_twofidelity(GARmodel: GARTwoFidelity, x_train, y_train,
                          max_iter: int = 100, lr_init: float = 1e-1, **kw):
    """`two_fidelity_models/GAR_GeneralizedAutoAR.py:74-110` contract."""
    return GARmodel._fit(x_train, y_train, train_GAR, max_iter, lr_init, **kw)
