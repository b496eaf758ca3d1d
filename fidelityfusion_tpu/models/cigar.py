"""CIGAR: Conditional-Independent GAR (autokrigeability shortcut).

TPU-native re-design of `FidelityFusion_Models/CIGAR.py:14-134`: GAR's
mean predictions can be obtained d^3-times cheaper by flattening the
tensor output and using a shared-kernel CIGP per fidelity instead of a
HOGP (exact mean parity with GAR per the reference README claim,
`README.md:25`); variance is the per-column diagonal broadcast.

    Y_hi(x) = TL_i(Y_lo(x)) + Res_i(x)       (outputs flattened to (n, D))
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fidelityfusion_tpu.models.cigp import CIGP
from fidelityfusion_tpu.models.coupling import TensorLinear
from fidelityfusion_tpu.models.data_manager import MultiFidelityDataManager
from fidelityfusion_tpu.models.ar import _run_stage, _residual_norm, stage_x
from fidelityfusion_tpu.ops.kernels import Kernel

import dataclasses


@dataclasses.dataclass(frozen=True)
class _Cigar0Loss:
    """Stage-0 NLML as an equality-stable callable: equal specs hash
    equal, so retrains of freshly built models reuse the compiled
    training program (train/fit.py cached path)."""

    gp: CIGP

    def __call__(self, p, x, y):
        return self.gp.nll(p["gp"], x, y)


@dataclasses.dataclass(frozen=True)
class _CigarResLoss:
    """Residual-stage NLML: lift the flattened low-fidelity batch with
    the TensorLinear map (trained through the loss) and standardize.
    ``rv`` is the imputed-variance target (None in subset mode)."""

    gp: CIGP
    tl: TensorLinear

    def __call__(self, p, sx, yl, yh, rv, shift, scale):
        lift = self.tl.apply(
            p["tl"], yl.reshape((yl.shape[0],) + self.tl.l_shape)
        )
        res = (yh - lift.reshape(lift.shape[0], -1) - shift) / scale
        return self.gp.nll(p["gp"], sx, res, y_var=rv)


class CIGAR:
    def __init__(
        self,
        fidelity_num: int,
        kernel_list: Sequence[Kernel],
        data_shape_list: Sequence[Tuple[int, ...]],
        if_nonsubset: bool = False,
        input_dim: int = 1,
    ):
        self.fidelity_num = fidelity_num
        self.if_nonsubset = if_nonsubset
        self.input_dim = input_dim
        self.data_shape_list = [tuple(s) for s in data_shape_list]
        self.gp_list: List[CIGP] = [CIGP(kernel=k) for k in kernel_list]
        self.tl_list = [
            TensorLinear(self.data_shape_list[i], self.data_shape_list[i + 1])
            for i in range(fidelity_num - 1)
        ]
        self.params = {
            "gp": [gp.init_params(input_dim) for gp in self.gp_list],
            "tl": [tl.init_params() for tl in self.tl_list],
        }
        # per-stage residual standardization; see models/ar.py
        self.stage_norm = [(0.0, 1.0)] * fidelity_num

    def _apply_tl_flat(self, i: int, params_tl, y_flat: jnp.ndarray) -> jnp.ndarray:
        """Apply the mode-map lift to a flattened (n, D_low) batch."""
        tl = self.tl_list[i]
        y = y_flat.reshape((y_flat.shape[0],) + tl.l_shape)
        out = tl.apply(params_tl, y)
        return out.reshape(out.shape[0], -1)

    def forward(
        self,
        data_manager: MultiFidelityDataManager,
        x_test: jnp.ndarray,
        to_fidelity: Optional[int] = None,
        denormalize: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Cascade (`CIGAR.py:41-82`): per-column means, diagonal variance
        broadcast across output columns.  ``x_test`` RAW; per-stage
        x-normalization as in `models/ar.py`."""
        fidelity_level = (
            to_fidelity if to_fidelity is not None else self.fidelity_num - 1
        )
        x_raw = x_test
        mean = var = None
        for i in range(fidelity_level + 1):
            xt_i = stage_x(data_manager, i, x_raw)
            if i == 0:
                x_tr, y_tr = data_manager.get_data(0, normal=True)
                y_tr = jnp.asarray(y_tr, jnp.float32).reshape(len(y_tr), -1)
                m, v = self.gp_list[0].predict_diag(
                    self.params["gp"][0],
                    jnp.asarray(x_tr, jnp.float32),
                    y_tr,
                    xt_i,
                )
                mean = m
                var = jnp.broadcast_to(v[:, None], m.shape)
            else:
                x_tr, y_tr = data_manager.get_data_by_name(f"res-{i}")
                y_mean = y_tr[0] if isinstance(y_tr, list) else y_tr
                y_mean = jnp.asarray(y_mean, jnp.float32).reshape(len(y_mean), -1)
                m_res, v_res = self.gp_list[i].predict_diag(
                    self.params["gp"][i],
                    jnp.asarray(x_tr, jnp.float32),
                    y_mean,
                    xt_i,
                )
                shift, scale = self.stage_norm[i]
                mean = (
                    self._apply_tl_flat(i - 1, self.params["tl"][i - 1], mean)
                    + shift + scale * m_res
                )
                var = (
                    self._apply_tl_flat(i - 1, self.params["tl"][i - 1], var)
                    + scale**2 * jnp.broadcast_to(v_res[:, None], m_res.shape)
                )
        if denormalize:
            norm = data_manager.normalizelayer[fidelity_level]
            mean = mean * float(norm.y_std) + float(norm.y_mean)
            var = var * float(norm.y_std) ** 2
        return mean, var

    __call__ = forward


def train_CIGAR(
    model: CIGAR,
    data_manager: MultiFidelityDataManager,
    max_iter: int = 100,
    lr_init: float = 1e-2,
    n_restarts: int = 4,
    seed: int = 0,
    debugger=None,
    n_mesh=None,
    nshard_min_rows: int = 2048,
) -> List[jnp.ndarray]:
    """Staged training (`CIGAR.py:84-134`): stage i >= 1 fits the CIGP on
    the flattened residual ``Y_hi - TL_i(Y_lo)`` with the TensorLinear map
    trained through the NLML; non-subset variance ``|var_hi - var_lo|``.

    ``n_mesh`` (round 5): stages with >= ``nshard_min_rows`` rows train
    through the n-axis-sharded distributed factorization; residual
    stages rebuild the TensorLinear-lifted target inside the sharded
    program (the lift acts on output columns — row-local; see
    `parallel/nsharded.py:restarts_nll_nsharded(lift=...)`)."""
    from fidelityfusion_tpu.models.ar import _run_stage_nsharded

    histories = []
    key = jax.random.PRNGKey(seed)
    for i_fid in range(model.fidelity_num):
        gp = model.gp_list[i_fid]
        if i_fid == 0:
            x_low, y_low = data_manager.get_data(0, normal=True)
            x_low = jnp.asarray(x_low, jnp.float32)
            y_low = jnp.asarray(y_low, jnp.float32).reshape(len(y_low), -1)

            stage_p = {"gp": model.params["gp"][0]}
            if (n_mesh is not None
                    and x_low.shape[0] >= nshard_min_rows):
                good, hist = _run_stage_nsharded(
                    gp, model.params["gp"][0], x_low, y_low, None,
                    n_mesh, max_iter, lr_init, n_restarts,
                    jax.random.fold_in(key, i_fid),
                )
                stage_p = {"gp": good}
            else:
                stage_p, hist = _run_stage(
                    _Cigar0Loss(gp), stage_p, max_iter, lr_init,
                    n_restarts, jax.random.fold_in(key, i_fid),
                    kernel_spec=gp.kernel, x=x_low, gp_field="gp",
                    loss_args=(x_low, y_low),
                )
            model.params["gp"][0] = stage_p["gp"]
        else:
            if model.if_nonsubset:
                subset_x, y_low_p, y_high_p = data_manager.get_nonsubset_fill_data(
                    model, i_fid - 1, i_fid
                )
                sx = jnp.asarray(subset_x, jnp.float32)
                yl = jnp.asarray(y_low_p[0], jnp.float32).reshape(len(subset_x), -1)
                yh = jnp.asarray(y_high_p[0], jnp.float32).reshape(len(subset_x), -1)
                rv = jnp.abs(
                    jnp.asarray(y_high_p[1], jnp.float32)
                    - jnp.asarray(y_low_p[1], jnp.float32)
                )

                shift, scale = _residual_norm(
                    yh - model._apply_tl_flat(
                        i_fid - 1, model.params["tl"][i_fid - 1], yl
                    )
                )
                model.stage_norm[i_fid] = (shift, scale)
                rv = rv / scale**2

                loss_args_i = (sx, yl, yh, rv,
                               jnp.float32(shift), jnp.float32(scale))

            else:
                _, y_low, subset_x, y_high = data_manager.get_overlap_input_data(
                    i_fid - 1, i_fid, normal=True
                )
                sx = jnp.asarray(subset_x, jnp.float32)
                yl = jnp.asarray(y_low, jnp.float32).reshape(len(subset_x), -1)
                yh = jnp.asarray(y_high, jnp.float32).reshape(len(subset_x), -1)

                shift, scale = _residual_norm(
                    yh - model._apply_tl_flat(
                        i_fid - 1, model.params["tl"][i_fid - 1], yl
                    )
                )
                model.stage_norm[i_fid] = (shift, scale)

                loss_args_i = (sx, yl, yh, None,
                               jnp.float32(shift), jnp.float32(scale))

            stage_p = {
                "gp": model.params["gp"][i_fid],
                "tl": model.params["tl"][i_fid - 1],
            }
            if (n_mesh is not None
                    and sx.shape[0] >= nshard_min_rows):
                sh_i, sc_i = model.stage_norm[i_fid]
                rv_i = loss_args_i[3]
                if rv_i is not None:
                    rv_i = jnp.asarray(rv_i, jnp.float32).reshape(-1)
                stage_p, hist = _run_stage_nsharded(
                    gp, stage_p, sx, None,
                    (yl, yh, jnp.float32(sh_i), jnp.float32(sc_i)),
                    n_mesh, max_iter, lr_init, n_restarts,
                    jax.random.fold_in(key, i_fid), gp_field="gp",
                    y_var=rv_i, lift=model.tl_list[i_fid - 1],
                )
            else:
                stage_p, hist = _run_stage(
                    _CigarResLoss(gp, model.tl_list[i_fid - 1]), stage_p,
                    max_iter, lr_init, n_restarts,
                    jax.random.fold_in(key, i_fid),
                    kernel_spec=gp.kernel, x=sx, gp_field="gp",
                    loss_args=loss_args_i,
                )
            model.params["gp"][i_fid] = stage_p["gp"]
            model.params["tl"][i_fid - 1] = stage_p["tl"]

            shift, scale = model.stage_norm[i_fid]
            res_final = (
                yh - model._apply_tl_flat(i_fid - 1, stage_p["tl"], yl) - shift
            ) / scale
            data_manager.add_data(
                raw_fidelity_name=f"res-{i_fid}",
                fidelity_index=None,
                x=np.asarray(sx),
                y=[np.asarray(res_final), None],
            )
        histories.append(hist)
        if debugger is not None:
            debugger.record_stage(i_fid, hist)
    return histories
