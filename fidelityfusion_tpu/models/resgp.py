"""ResGP: residual multi-fidelity GP (rho fixed at 1).

TPU-native re-design of `FidelityFusion_Models/ResGP.py:12-112`:
    y_hi(x) = y_lo(x) + res_i(x)
Training/prediction structure is identical to AR with rho == 1 and no
trainable coupling parameter.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fidelityfusion_tpu.models.cigp import CIGP
from fidelityfusion_tpu.models.data_manager import MultiFidelityDataManager
from fidelityfusion_tpu.models.ar import (
    _CigpNLL,
    _run_stage,
    _run_stage_nsharded,
    _residual_norm,
    stage_x,
)
from fidelityfusion_tpu.ops.kernels import Kernel


class ResGP:
    def __init__(
        self,
        fidelity_num: int,
        kernel_list: Sequence[Kernel],
        if_nonsubset: bool = False,
        input_dim: int = 1,
    ):
        self.fidelity_num = fidelity_num
        self.gp_list: List[CIGP] = [CIGP(kernel=k) for k in kernel_list]
        self.if_nonsubset = if_nonsubset
        self.input_dim = input_dim
        self.params = {"gp": [gp.init_params(input_dim) for gp in self.gp_list]}
        # per-stage residual standardization; see models/ar.py
        self.stage_norm = [(0.0, 1.0)] * fidelity_num

    def export_posterior(self, data_manager, to_fidelity=None, diag=True,
                         pad_multiple=None):
        """Functional predict path (rho fixed at 1); see
        `models/ar.py:AR.export_posterior`."""
        from fidelityfusion_tpu.models.ar import _export_cascade

        return _export_cascade(self, data_manager, to_fidelity, diag,
                               pad_multiple)

    def forward(
        self,
        data_manager: MultiFidelityDataManager,
        x_test: jnp.ndarray,
        to_fidelity: Optional[int] = None,
        denormalize: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Cascade: posterior of fidelity-0 plus residual posteriors
        (`ResGP.py:31-65`).  ``x_test`` is RAW; per-stage x-normalization
        and output denormalization as in `models/ar.py`."""
        fidelity_level = (
            to_fidelity if to_fidelity is not None else self.fidelity_num - 1
        )
        x_raw = x_test
        mean, cov = None, None
        for i in range(fidelity_level + 1):
            xt_i = stage_x(data_manager, i, x_raw)
            if i == 0:
                x_tr, y_tr = data_manager.get_data(0, normal=True)
                mean, cov = self.gp_list[0].predict(
                    self.params["gp"][0],
                    jnp.asarray(x_tr, jnp.float32),
                    jnp.asarray(y_tr, jnp.float32),
                    xt_i,
                )
            else:
                x_tr, y_tr = data_manager.get_data_by_name(f"res-{i}")
                y_mean = y_tr[0] if isinstance(y_tr, list) else y_tr
                m_res, c_res = self.gp_list[i].predict(
                    self.params["gp"][i],
                    jnp.asarray(x_tr, jnp.float32),
                    jnp.asarray(y_mean, jnp.float32),
                    xt_i,
                )
                shift, scale = self.stage_norm[i]
                mean = mean + (shift + scale * m_res)
                cov = cov + scale**2 * c_res
        if denormalize:
            norm = data_manager.normalizelayer[fidelity_level]
            mean = mean * float(norm.y_std) + float(norm.y_mean)
            cov = cov * float(norm.y_std) ** 2
        return mean, cov

    __call__ = forward


def train_ResGP(
    model: ResGP,
    data_manager: MultiFidelityDataManager,
    max_iter: int = 100,
    lr_init: float = 1e-2,
    n_restarts: int = 4,
    seed: int = 0,
    debugger=None,
    n_mesh=None,
    nshard_min_rows: int = 2048,
) -> List[jnp.ndarray]:
    """Sequential per-fidelity training (`ResGP.py:67-112`): stage i >= 1
    fits the residual ``y_hi - y_lo`` on the overlap (subset) or the imputed
    mean/var pair with ``var = |var_hi - var_lo|`` (non-subset,
    `ResGP.py:96-97`).

    ``n_mesh`` (round 5): stages with >= ``nshard_min_rows`` rows train
    through the n-axis-sharded distributed factorization (ResGP targets
    are PRECOMPUTED — rho is fixed at 1 — so every stage, including the
    imputed-variance non-subset ones, dispatches; see
    `models/ar.py:train_AR`)."""
    histories = []
    key = jax.random.PRNGKey(seed)

    def run(gp, params, x, y, y_var, k):
        if n_mesh is not None and x.shape[0] >= nshard_min_rows:
            return _run_stage_nsharded(
                gp, params, x, y, None, n_mesh, max_iter, lr_init,
                n_restarts, k, y_var=y_var,
            )
        return _run_stage(
            _CigpNLL(gp), params, max_iter, lr_init, n_restarts, k,
            kernel_spec=gp.kernel, x=x, loss_args=(x, y, y_var),
        )

    for i_fid in range(model.fidelity_num):
        gp = model.gp_list[i_fid]
        if i_fid == 0:
            x_low, y_low = data_manager.get_data(0, normal=True)
            x_low = jnp.asarray(x_low, jnp.float32)
            y_low = jnp.asarray(y_low, jnp.float32)

            new_p, hist = run(gp, model.params["gp"][0], x_low, y_low,
                              None, jax.random.fold_in(key, i_fid))
            model.params["gp"][0] = new_p
        else:
            if model.if_nonsubset:
                subset_x, y_low_p, y_high_p = data_manager.get_nonsubset_fill_data(
                    model, i_fid - 1, i_fid
                )
                sx = jnp.asarray(subset_x, jnp.float32)
                res_raw = jnp.asarray(y_high_p[0] - y_low_p[0], jnp.float32)
                shift, scale = _residual_norm(res_raw)
                model.stage_norm[i_fid] = (shift, scale)
                res_mean = (res_raw - shift) / scale
                res_var = jnp.abs(
                    jnp.asarray(y_high_p[1] - y_low_p[1], jnp.float32)
                ) / scale**2

                loss_args_i = (sx, res_mean, res_var)
                store_y = [np.asarray(res_mean), np.asarray(res_var)]
            else:
                _, y_low, subset_x, y_high = data_manager.get_overlap_input_data(
                    i_fid - 1, i_fid, normal=True
                )
                sx = jnp.asarray(subset_x, jnp.float32)
                res_raw = jnp.asarray(y_high - y_low, jnp.float32)
                shift, scale = _residual_norm(res_raw)
                model.stage_norm[i_fid] = (shift, scale)
                res_mean = (res_raw - shift) / scale

                loss_args_i = (sx, res_mean, None)
                store_y = [np.asarray(res_mean), None]

            data_manager.add_data(
                raw_fidelity_name=f"res-{i_fid}",
                fidelity_index=None,
                x=np.asarray(sx),
                y=store_y,
            )
            new_p, hist = run(gp, model.params["gp"][i_fid],
                              *loss_args_i, jax.random.fold_in(key, i_fid))
            model.params["gp"][i_fid] = new_p
        histories.append(hist)
        if debugger is not None:
            debugger.record_stage(i_fid, hist)
    return histories
