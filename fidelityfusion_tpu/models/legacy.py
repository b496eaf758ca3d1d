"""Legacy config-driven API adapters.

TPU-native re-design of the `MFGP_ver2023May` model contract
(`MFGP_ver2023May/README.md:36-75`): config-dict construction with
defaults merging, plus the methods

    base GP:     forward(x, x_var=0.) / compute_loss(x, y, ...)
    coupling GP: single_fidelity_forward(x, y_low, ..., fidelity_index)
                 single_fidelity_compute_loss(x, y_low, y_high, ...,
                                              fidelity_index)
                 forward(x, x_var=0., to_fidelity_n=-1)
                 compute_loss(x_list, y_list, to_fidelity_n=-1)

implemented as thin stateful wrappers over the functional core
(`models/cigp.py`, `models/ar.py`, ...).  Like the legacy stack
(`base_gp/cigp.py:42-43,117-122`), the wrapper caches training data on the
first `compute_loss` call; `compute_loss` returns the scalar NLML (to
MINIMIZE — note the current-stack sign convention differs) and
`parameters()` exposes the pytree for an external optimizer, though the
recommended path is the jitted trainers in `models/joint.py` /
`train/fit.py`.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from fidelityfusion_tpu.models.cigp import CIGP as CIGPCore
from fidelityfusion_tpu.models.fides import FIDES as FIDESCore, FidelityBounds
from fidelityfusion_tpu.models.hogp import HOGP as HOGPCore
from fidelityfusion_tpu.ops.kernels import ARDKernel, Kernel, SquaredExponentialKernel
from fidelityfusion_tpu.train.fit import fit
from fidelityfusion_tpu.utils.config import update_dict_with_default

KERNEL_REGISTRY = {
    "SE": SquaredExponentialKernel,
    "ARD": ARDKernel,
}


def create_kernel(cfg: dict) -> Kernel:
    """Kernel registry dispatch (`MFGP_ver2023May/kernel/kernel_utils.py:5-28`)."""
    (name, kw), = cfg.items() if len(cfg) == 1 else [list(cfg.items())[0]]
    if name in ("SE", "kernel_res"):
        return SquaredExponentialKernel()
    if name in KERNEL_REGISTRY:
        return KERNEL_REGISTRY[name]()
    raise KeyError(f"unknown kernel {name!r}")


class LegacyCIGP:
    """Config-driven CIGP (`MFGP_ver2023May/base_gp/cigp.py:19-136`)."""

    default_config = {
        "noise": {"init_value": 1.0},
        "kernel": {"SE": {"length_scale": 1.0, "scale": 1.0}},
        "input_dim": 1,
    }

    def __init__(self, config: Optional[dict] = None):
        cfg = update_dict_with_default(self.default_config, config or {})
        self.config = cfg
        self.core = CIGPCore(kernel=create_kernel(cfg["kernel"]))
        self.params = self.core.init_params(
            cfg["input_dim"], log_beta=float(cfg["noise"]["init_value"])
        )
        self.train_x = None
        self.train_y = None

    def compute_loss(self, x, y, x_var=0.0, y_var=0.0, update_data=False):
        x = jnp.asarray(x, jnp.float32)
        y = jnp.asarray(y, jnp.float32)
        if self.train_x is None or update_data:
            self.train_x, self.train_y = x, y
        yv = None if np.isscalar(y_var) and y_var == 0.0 else jnp.asarray(y_var)
        return self.core.nll(self.params, x, y, y_var=yv)

    def forward(self, x, x_var=0.0):
        """Posterior mean + DIAGONAL variance (`base_gp/cigp.py:90-95`)."""
        if self.train_x is None:
            raise RuntimeError("compute_loss must cache training data first")
        mean, var = self.core.predict_diag(
            self.params, self.train_x, self.train_y, jnp.asarray(x, jnp.float32)
        )
        return mean, var.reshape(-1, 1)

    def fit(self, x, y, max_iter=100, lr=5e-2):
        """Convenience jitted trainer (not in the legacy API)."""
        self.compute_loss(x, y, update_data=True)
        res = fit(
            lambda p: self.core.nll(p, self.train_x, self.train_y),
            self.params, steps=max_iter, lr=lr,
        )
        self.params = res.params
        return res.losses


class LegacyHOGP:
    """Config-driven HOGP (`MFGP_ver2023May/base_gp/hogp.py:35-240`)."""

    default_config = {
        "noise": {"init_value": 1.0},
        "kernel": {"SE": {}},
        "input_dim": 1,
        "output_shape": (4, 4),
    }

    def __init__(self, config: Optional[dict] = None):
        cfg = update_dict_with_default(self.default_config, config or {})
        if int(np.prod(cfg["output_shape"])) == 1:
            import warnings

            warnings.warn("HOGP with scalar outputs; use CIGP instead")
        self.config = cfg
        self.core = HOGPCore(
            kernel=create_kernel(cfg["kernel"]),
            output_shape=tuple(cfg["output_shape"]),
        )
        self.params = self.core.init_params(
            cfg["input_dim"], noise_variance=float(cfg["noise"]["init_value"])
        )
        self.train_x = None
        self.train_y = None
        self._state = None

    def compute_loss(self, x, y, x_var=0.0, y_var=0.0, update_data=False):
        x = jnp.asarray(x, jnp.float32)
        y = jnp.asarray(y, jnp.float32)
        if self.train_x is None or update_data:
            self.train_x, self.train_y = x, y
        loss, state = self.core.nll_with_state(self.params, x, y)
        self._state = state
        return loss

    def forward(self, x, x_var=0.0):
        if self._state is None:
            # explicit-state version of the legacy compute_kernel_cache
            # (`base_gp/hogp.py:120-137`)
            _, self._state = self.core.nll_with_state(
                self.params, self.train_x, self.train_y
            )
        return self.core.predict(
            self.params, self._state, self.train_x, jnp.asarray(x, jnp.float32)
        )

    def fit(self, x, y, max_iter=100, lr=5e-2):
        self.compute_loss(x, y, update_data=True)
        res = fit(
            lambda p: self.core.nll(p, self.train_x, self.train_y),
            self.params, steps=max_iter, lr=lr,
        )
        self.params = res.params
        _, self._state = self.core.nll_with_state(
            self.params, self.train_x, self.train_y
        )
        return res.losses


class LegacyFIDES:
    """Config-driven FIDES (`MFGP_ver2023May/base_gp/fides.py:21-152`)."""

    default_config = {
        "noise": {"init_value": 1.0, "format": "exp"},
        "kernel": {"kernel_res": {}},
        "input_dim": 1,
    }

    def __init__(self, config: Optional[dict] = None):
        cfg = update_dict_with_default(self.default_config, config or {})
        self.config = cfg
        self.core = FIDESCore()
        self.params = self.core.init_params(cfg["input_dim"])
        self.bounds = None
        self.train_x = None
        self.train_y = None

    def set_fidelity(self, l1, h1, l2, h2):
        self.bounds = FidelityBounds(float(l1), float(h1), float(l2), float(h2))

    def compute_loss(self, x, y, x_var=0.0, y_var=0.0, update_data=False):
        assert self.bounds is not None, "call set_fidelity first"
        x = jnp.asarray(x, jnp.float32)
        y = jnp.asarray(y, jnp.float32)
        if self.train_x is None or update_data:
            self.train_x, self.train_y = x, y
        return self.core.nll(self.params, x, y, self.bounds)

    def forward(self, x, x_var=0.0):
        assert self.bounds is not None and self.train_x is not None
        return self.core.predict(
            self.params, self.train_x, self.train_y,
            jnp.asarray(x, jnp.float32), self.bounds,
        )

    def fit(self, x, y, max_iter=100, lr=5e-2):
        self.compute_loss(x, y, update_data=True)
        res = fit(
            lambda p: self.core.nll(p, self.train_x, self.train_y, self.bounds),
            self.params, steps=max_iter, lr=lr,
        )
        self.params = res.params
        return res.losses
