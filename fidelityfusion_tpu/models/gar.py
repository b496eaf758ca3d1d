"""GAR: Generalized AutoRegression for tensor-valued (field) outputs.

TPU-native re-design of `FidelityFusion_Models/GAR.py:13-126`: per-fidelity
HOGP surrogates over tensor outputs with trainable `TensorLinear` per-mode
lifts coupling fidelities whose output grids differ (non-aligned data):

    Y_hi(x) = TL_i(Y_lo(x)) + Res_i(x)

Handles non-aligned outputs (different spatial resolution per fidelity)
via the interpolation-initialized mode maps.  Training is staged like AR;
each HOGP stage returns an explicit posterior state consumed at predict
time (the reference relies on `log_likelihood`-cached attributes instead —
`GAR.py:113` note about train-then-predict order).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fidelityfusion_tpu.models.coupling import TensorLinear
from fidelityfusion_tpu.models.data_manager import MultiFidelityDataManager
from fidelityfusion_tpu.models.hogp import HOGP, HOGPState
from fidelityfusion_tpu.models.ar import _run_stage, _residual_norm, stage_x
from fidelityfusion_tpu.ops.kernels import Kernel

import dataclasses


@dataclasses.dataclass(frozen=True)
class _Gar0Loss:
    """Stage-0 HOGP NLML as an equality-stable callable (compiled-program
    reuse across retrains; see models/ar.py:_CigpNLL)."""

    hogp: HOGP

    def __call__(self, p, x, y):
        return self.hogp.nll(p["hogp"], x, y)


@dataclasses.dataclass(frozen=True)
class _GarResLoss:
    """Residual-stage HOGP NLML with the TensorLinear lift trained
    through the loss; ``rv`` is the imputed variance (None in subset
    mode)."""

    hogp: HOGP
    tl: TensorLinear

    def __call__(self, p, sx, yl, yh, rv, shift, scale):
        res = (yh - self.tl.apply(p["tl"], yl) - shift) / scale
        return self.hogp.nll(p["hogp"], sx, res, y_var=rv)


# Above this many training rows, HOGP stages train through the
# warm-started spectral-tracking NLML (`models/hogp.py:nll_tracked`):
# XLA:TPU's serial QDWH eigh dominates the step beyond ~512 rows
# (scripts/profile_hogp.py: ~48 of 51 ms at n=1024), while tracking
# replaces it with GEMM Jacobi sweeps between scheduled refreshes.
_TRACK_N_THRESHOLD = 512


@dataclasses.dataclass(frozen=True)
class _Gar0LossTracked:
    """`_Gar0Loss` through the tracked-spectrum NLML (aux-carry
    signature; see `train/fit.py:adam_scan_aux`).  ``refresh_every``
    parametrizes the schedule: the default 64 is the shipping static
    calendar; the two-level adaptive driver
    (`train/fit.py:fit_restarts_tracked_adaptive`) passes a huge value
    so the calendar fires only at each segment's step-0."""

    hogp: HOGP
    refresh_every: int = 64

    def __call__(self, p, aux, step, x, y):
        return self.hogp.nll_tracked(
            p["hogp"], aux, step, x, y, refresh_every=self.refresh_every
        )


@dataclasses.dataclass(frozen=True)
class _GarResLossTracked:
    """`_GarResLoss` through the tracked-spectrum NLML."""

    hogp: HOGP
    tl: TensorLinear
    refresh_every: int = 64

    def __call__(self, p, aux, step, sx, yl, yh, rv, shift, scale):
        res = (yh - self.tl.apply(p["tl"], yl) - shift) / scale
        return self.hogp.nll_tracked(
            p["hogp"], aux, step, sx, res, y_var=rv,
            refresh_every=self.refresh_every,
        )


class GAR:
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
        # Stage i's HOGP models the fidelity-i field (stage 0: raw data,
        # stage i>0: the residual Y_hi - TL(Y_lo), which lives on grid i).
        # The reference indexes shapes as k=i+1 (`GAR.py:28-31`), which only
        # types-out when all fidelity shapes coincide; shapes[i] is correct
        # for genuinely non-aligned data.
        self.hogp_list: List[HOGP] = [
            HOGP(kernel=kernel_list[i], output_shape=self.data_shape_list[min(i, len(self.data_shape_list) - 1)])
            for i in range(fidelity_num)
        ]
        self.tl_list = [
            TensorLinear(self.data_shape_list[i], self.data_shape_list[i + 1])
            for i in range(fidelity_num - 1)
        ]
        self.params = {
            "hogp": [h.init_params(input_dim) for h in self.hogp_list],
            "tl": [tl.init_params() for tl in self.tl_list],
        }
        self.states: List[Optional[HOGPState]] = [None] * fidelity_num
        # per-stage residual standardization; see models/ar.py
        self.stage_norm = [(0.0, 1.0)] * fidelity_num

    def _stage_train_data(self, data_manager, i):
        if i == 0:
            x_tr, y_tr = data_manager.get_data(0, normal=True)
        else:
            x_tr, y_tr = data_manager.get_data_by_name(f"res-{i}")
            if isinstance(y_tr, list):
                y_tr = y_tr[0]
        return jnp.asarray(x_tr, jnp.float32), jnp.asarray(y_tr, jnp.float32)

    def forward(
        self,
        data_manager: MultiFidelityDataManager,
        x_test: jnp.ndarray,
        to_fidelity: Optional[int] = None,
        denormalize: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Cascade (`GAR.py:40-74`): mean_hi = TL(mean_lo) + mean_res,
        var_hi = TL(var_lo) + var_res (per-element diagonal variances).
        ``x_test`` RAW; per-stage x-normalization as in `models/ar.py`."""
        fidelity_level = (
            to_fidelity if to_fidelity is not None else self.fidelity_num - 1
        )
        x_raw = x_test
        mean = var = None
        for i in range(fidelity_level + 1):
            xt_i = stage_x(data_manager, i, x_raw)
            x_tr, _ = self._stage_train_data(data_manager, i)
            state = self.states[i]
            if state is None:
                raise RuntimeError("GAR.forward called before train_GAR")
            m_i, v_i = self.hogp_list[i].predict(
                self.params["hogp"][i], state, x_tr, xt_i
            )
            if i == 0:
                mean, var = m_i, v_i
            else:
                tl = self.tl_list[i - 1]
                shift, scale = self.stage_norm[i]
                mean = tl.apply(self.params["tl"][i - 1], mean) + shift + scale * m_i
                var = tl.apply(self.params["tl"][i - 1], var) + scale**2 * v_i
        if denormalize:
            norm = data_manager.normalizelayer[fidelity_level]
            mean = mean * float(norm.y_std) + float(norm.y_mean)
            var = var * float(norm.y_std) ** 2
        return mean, var

    __call__ = forward


def train_GAR(
    model: GAR,
    data_manager: MultiFidelityDataManager,
    max_iter: int = 100,
    lr_init: float = 1e-2,
    n_restarts: int = 4,
    seed: int = 0,
    debugger=None,
    n_mesh=None,
    nshard_min_rows: int = 2048,
) -> List[jnp.ndarray]:
    """Staged training (`GAR.py:76-126`): stage i >= 1 fits the HOGP on the
    residual ``Y_hi - TL_i(Y_lo)`` with the TensorLinear map trained through
    the HOGP NLML; non-subset variance ``|var_hi - var_lo|`` enters K_0's
    diagonal.

    ``n_mesh`` (round 5): a mesh with an ``"n"`` axis — stages with at
    least ``nshard_min_rows`` rows train through the n-axis-sharded
    tracked-spectrum Kronecker NLML (`parallel/kron_nsharded.py`:
    distributed mode-products, single-init tracked Adam at the shipping
    refresh_every=64 schedule; n must divide the axis size).  This is
    SURVEY §5.7's "sharded Kronecker mode-products for GAR" trainer
    entry point.  Smaller stages keep the single-device restart path.
    """
    histories = []
    key = jax.random.PRNGKey(seed)
    for i_fid in range(model.fidelity_num):
        hogp = model.hogp_list[i_fid]
        if i_fid == 0:
            x_low, y_low = data_manager.get_data(0, normal=True)
            x_low = jnp.asarray(x_low, jnp.float32)
            y_low = jnp.asarray(y_low, jnp.float32)

            stage_p = {"hogp": model.params["hogp"][0]}
            nshard = (n_mesh is not None
                      and x_low.shape[0] >= nshard_min_rows
                      and x_low.shape[0] % int(n_mesh.shape["n"]) == 0)
            tracked = x_low.shape[0] >= _TRACK_N_THRESHOLD
            if nshard:
                from fidelityfusion_tpu.parallel.kron_nsharded import (
                    fit_hogp_nsharded,
                )

                good, hist, _aux = fit_hogp_nsharded(
                    hogp, stage_p["hogp"], x_low, y_low, n_mesh,
                    steps=max_iter, lr=lr_init, refresh_every=64,
                )
                stage_p = {"hogp": good}
            else:
                stage_p, hist = _run_stage(
                    _Gar0LossTracked(hogp) if tracked else _Gar0Loss(hogp),
                    stage_p, max_iter, lr_init, n_restarts,
                    jax.random.fold_in(key, i_fid),
                    kernel_spec=hogp.kernel, x=x_low, gp_field="hogp",
                    loss_args=(x_low, y_low),
                    aux0=hogp.tracking_aux0(x_low.shape[0]) if tracked
                    else None,
                )
            model.params["hogp"][0] = stage_p["hogp"]
            _, state = hogp.nll_with_state(stage_p["hogp"], x_low, y_low)
            model.states[0] = state
        else:
            tl = model.tl_list[i_fid - 1]
            if model.if_nonsubset:
                subset_x, y_low_p, y_high_p = data_manager.get_nonsubset_fill_data(
                    model, i_fid - 1, i_fid
                )
                sx = jnp.asarray(subset_x, jnp.float32)
                yl_m = jnp.asarray(y_low_p[0], jnp.float32).reshape(
                    (len(subset_x),) + model.data_shape_list[i_fid - 1]
                )
                yh_m = jnp.asarray(y_high_p[0], jnp.float32).reshape(
                    (len(subset_x),) + model.data_shape_list[i_fid]
                )
                res_var = jnp.abs(
                    jnp.asarray(y_high_p[1], jnp.float32)
                    - jnp.asarray(y_low_p[1], jnp.float32)
                )

                shift, scale = _residual_norm(
                    yh_m - tl.apply(model.params["tl"][i_fid - 1], yl_m)
                )
                model.stage_norm[i_fid] = (shift, scale)
                res_var = res_var / scale**2

                loss_args_i = (sx, yl_m, yh_m, res_var,
                               jnp.float32(shift), jnp.float32(scale))

            else:
                _, y_low, subset_x, y_high = data_manager.get_overlap_input_data(
                    i_fid - 1, i_fid, normal=True
                )
                sx = jnp.asarray(subset_x, jnp.float32)
                yl = jnp.asarray(y_low, jnp.float32)
                yh = jnp.asarray(y_high, jnp.float32)

                shift, scale = _residual_norm(
                    yh - tl.apply(model.params["tl"][i_fid - 1], yl)
                )
                model.stage_norm[i_fid] = (shift, scale)

                loss_args_i = (sx, yl, yh, None,
                               jnp.float32(shift), jnp.float32(scale))

            stage_p = {
                "hogp": model.params["hogp"][i_fid],
                "tl": model.params["tl"][i_fid - 1],
            }
            nshard = (n_mesh is not None
                      and sx.shape[0] >= nshard_min_rows
                      and sx.shape[0] % int(n_mesh.shape["n"]) == 0)
            tracked = sx.shape[0] >= _TRACK_N_THRESHOLD
            if nshard:
                from fidelityfusion_tpu.parallel.kron_nsharded import (
                    fit_hogp_nsharded,
                )

                sh_i, sc_i = model.stage_norm[i_fid]
                yl_s = loss_args_i[1]
                yh_s = loss_args_i[2]
                rv_s = loss_args_i[3]
                if rv_s is not None:
                    rv_s = jnp.asarray(rv_s, jnp.float32).reshape(-1)
                stage_p, hist, _aux = fit_hogp_nsharded(
                    hogp, stage_p, sx, None, n_mesh, steps=max_iter,
                    lr=lr_init, refresh_every=64, y_var=rv_s,
                    residual=(tl, yl_s, yh_s, jnp.float32(sh_i),
                              jnp.float32(sc_i)),
                )
            else:
                stage_p, hist = _run_stage(
                    _GarResLossTracked(hogp, tl) if tracked
                    else _GarResLoss(hogp, tl),
                    stage_p, max_iter, lr_init,
                    n_restarts, jax.random.fold_in(key, i_fid),
                    kernel_spec=hogp.kernel, x=sx, gp_field="hogp",
                    loss_args=loss_args_i,
                    aux0=hogp.tracking_aux0(sx.shape[0]) if tracked
                    else None,
                )
            model.params["hogp"][i_fid] = stage_p["hogp"]
            model.params["tl"][i_fid - 1] = stage_p["tl"]

            # final residual dataset + posterior state for the cascade
            shift, scale = model.stage_norm[i_fid]
            if model.if_nonsubset:
                res_final = (yh_m - tl.apply(stage_p["tl"], yl_m) - shift) / scale
                _, state = hogp.nll_with_state(
                    stage_p["hogp"], sx, res_final, y_var=res_var
                )
            else:
                res_final = (yh - tl.apply(stage_p["tl"], yl) - shift) / scale
                _, state = hogp.nll_with_state(stage_p["hogp"], sx, res_final)
            model.states[i_fid] = state
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
