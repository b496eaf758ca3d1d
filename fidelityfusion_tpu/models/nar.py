"""NAR: nonlinear autoregressive multi-fidelity GP.

TPU-native re-design of `FidelityFusion_Models/NAR.py:12-110`: fidelity i's
GP takes the concatenated input ``[x, y_{i-1}(x)]`` — a nonlinear coupling
learned by the kernel, with no rho parameter.  Prediction feeds the
*predicted* low-fidelity mean into the next stage (`NAR.py:55-57`).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fidelityfusion_tpu.models.cigp import CIGP
from fidelityfusion_tpu.models.data_manager import MultiFidelityDataManager
from fidelityfusion_tpu.models.ar import _CigpNLL, _run_stage, pad_with_mask, stage_x
from fidelityfusion_tpu.ops.kernels import Kernel


class NAR:
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
        # stage i > 0 sees [x, y_low] -> input_dim + 1 (single-output y)
        self.params = {
            "gp": [
                gp.init_params(input_dim if i == 0 else input_dim + 1)
                for i, gp in enumerate(self.gp_list)
            ]
        }

    def forward(
        self,
        data_manager: MultiFidelityDataManager,
        x_test: jnp.ndarray,
        to_fidelity: Optional[int] = None,
        denormalize: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Cascade (`NAR.py:30-61`): stage i's GP is evaluated at
        ``[x (stage-i space), predicted y_low (fidelity i-1 normalized-y)]``
        — exactly the space its ``concat-i`` training set lives in.
        ``x_test`` is RAW; see `models/ar.py` for the normalization design."""
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
                x_tr, y_tr = data_manager.get_data_by_name(f"concat-{i}")
                y_mean = y_tr[0] if isinstance(y_tr, list) else y_tr
                concat_test = jnp.concatenate(
                    [xt_i, mean.reshape(xt_i.shape[0], -1)], axis=-1
                )
                mean, cov = self.gp_list[i].predict(
                    self.params["gp"][i],
                    jnp.asarray(x_tr, jnp.float32),
                    jnp.asarray(y_mean, jnp.float32),
                    concat_test,
                )
        if denormalize:
            norm = data_manager.normalizelayer[fidelity_level]
            mean = mean * float(norm.y_std) + float(norm.y_mean)
            cov = cov * float(norm.y_std) ** 2
        return mean, cov

    __call__ = forward

    def export_posterior(self, data_manager, to_fidelity=None, diag=True,
                         pad_multiple=None):
        """Functional prediction cascade (same contract as
        `AR.export_posterior`): a hashable `NARPosterior` plus a state
        pytree holding all stage data/params, so jitted consumers compile
        once per shape bucket.  Call `train_NAR` first (stage data lives
        under ``concat-{i}`` in the data manager)."""
        level = (
            to_fidelity if to_fidelity is not None else self.fidelity_num - 1
        )
        stages = []
        for i in range(level + 1):
            norm = data_manager.normalizelayer.get(i)
            x_mean = (
                jnp.asarray(norm.x_mean, jnp.float32)
                if norm is not None else jnp.float32(0.0)
            )
            x_std = (
                jnp.asarray(norm.x_std, jnp.float32) + 1e-10
                if norm is not None else jnp.float32(1.0)
            )
            if i == 0:
                x_tr, y_tr = data_manager.get_data(0, normal=True)
                y_use = y_tr
            else:
                x_tr, y_tr = data_manager.get_data_by_name(f"concat-{i}")
                y_use = y_tr[0] if isinstance(y_tr, list) else y_tr
            if pad_multiple:
                x_p, y_p, mask = pad_with_mask(x_tr, y_use, pad_multiple)
            else:
                x_p = jnp.asarray(x_tr, jnp.float32)
                y_p = jnp.asarray(y_use, jnp.float32)
                mask = None
            # per-stage factorization cached at export (see
            # models/ar.py:_export_cascade) — calls are GEMM-only
            cache = self.gp_list[i].posterior_cache(
                self.params["gp"][i], x_p, y_p, mask=mask
            )
            stages.append(
                {
                    "x": x_p, "cache": cache, "mask": mask,
                    "gp": self.params["gp"][i],
                    "x_mean": x_mean, "x_std": x_std,
                }
            )
        norm = data_manager.normalizelayer[level]
        state = {
            "stages": stages,
            "y_norm": (
                jnp.float32(float(norm.y_mean)), jnp.float32(float(norm.y_std))
            ),
        }
        return NARPosterior(tuple(self.gp_list), level, diag), state


@dataclasses.dataclass(frozen=True)
class NARPosterior:
    """`NAR.forward` as a hashable functional over a state pytree: stage
    i >= 1 evaluates its GP at ``[normalize_i(x), mean_{i-1}]`` — the
    nonlinear coupling — and only the final stage's variance is reported
    (the reference cascade replaces, not accumulates, covariance,
    `NAR.py:55-61`)."""

    gps: tuple
    to_fidelity: int
    diag: bool = True

    def __call__(self, state, x_raw):
        x_raw = jnp.asarray(x_raw, jnp.float32)
        mean = var = None
        for i in range(self.to_fidelity + 1):
            st = state["stages"][i]
            xt = (x_raw - st["x_mean"]) / st["x_std"]
            if i > 0:
                xt = jnp.concatenate(
                    [xt, mean.reshape(xt.shape[0], -1)], axis=-1
                )
            predict = (
                self.gps[i].predict_diag_cached if self.diag
                else self.gps[i].predict_cached
            )
            mean, var = predict(st["gp"], st["cache"], st["x"], xt,
                                mask=st["mask"])
        y_mean, y_std = state["y_norm"]
        return mean * y_std + y_mean, var * y_std**2


def train_NAR(
    model: NAR,
    data_manager: MultiFidelityDataManager,
    max_iter: int = 100,
    lr_init: float = 1e-2,
    n_restarts: int = 4,
    seed: int = 0,
    debugger=None,
    n_mesh=None,
    nshard_min_rows: int = 2048,
) -> List[jnp.ndarray]:
    """Sequential training (`NAR.py:63-110`): stage i >= 1 fits a GP from
    ``[subset_x, y_low]`` to ``y_high`` and registers the concatenated
    training set as ``concat-i`` for the prediction cascade.

    ``n_mesh`` (round 5): stages with >= ``nshard_min_rows`` rows train
    through the n-axis-sharded distributed factorization (NAR stage
    inputs/targets are precomputed concatenations, so every stage
    dispatches; see `models/ar.py:train_AR`)."""
    from fidelityfusion_tpu.models.ar import _run_stage_nsharded

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
                y_low_mean = y_low_p[0]
                y_high_mean = jnp.asarray(y_high_p[0], jnp.float32)
                y_high_var = jnp.asarray(y_high_p[1], jnp.float32)
            else:
                _, y_low_mean, subset_x, y_high_mean = (
                    data_manager.get_overlap_input_data(
                        i_fid - 1, i_fid, normal=True
                    )
                )
                y_high_mean = jnp.asarray(y_high_mean, jnp.float32)
                y_high_var = None
            concat_x = jnp.concatenate(
                [
                    jnp.asarray(subset_x, jnp.float32),
                    jnp.asarray(y_low_mean, jnp.float32).reshape(len(subset_x), -1),
                ],
                axis=-1,
            )
            data_manager.add_data(
                raw_fidelity_name=f"concat-{i_fid}",
                fidelity_index=None,
                x=np.asarray(concat_x),
                y=[
                    np.asarray(y_high_mean),
                    None if y_high_var is None else np.asarray(y_high_var),
                ],
            )

            new_p, hist = run(gp, model.params["gp"][i_fid], concat_x,
                              y_high_mean, y_high_var,
                              jax.random.fold_in(key, i_fid))
            model.params["gp"][i_fid] = new_p
        histories.append(hist)
        if debugger is not None:
            debugger.record_stage(i_fid, hist)
    return histories
