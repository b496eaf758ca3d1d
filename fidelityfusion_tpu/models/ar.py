"""AR (Kennedy-O'Hagan autoregressive) multi-fidelity fusion.

TPU-native re-design of `FidelityFusion_Models/AR_autoRegression.py:12-140`:
    y_hi(x) = rho_i * y_lo(x) + res_i(x)
with a CIGP residual GP per fidelity and a trainable scalar rho per step.

Architecture: the model object holds only static specs + a parameter
pytree; training is *staged* — each fidelity's (GP hyperparams, rho) is
optimized by one jit-compiled `lax.scan` Adam loop (`train/fit.py`), with
optional vmapped random restarts.  Residual targets are recomputed inside
the loss so rho receives gradients through them, exactly like the
reference (`AR_autoRegression.py:125-130`).  Non-subset data handling
(imputing missing low-fidelity observations via the model's own cascade,
`MF_data.py:253-303`) happens *between* stages as an explicit staged
computation, keeping every jitted graph static.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fidelityfusion_tpu.models.cigp import CIGP
from fidelityfusion_tpu.models.data_manager import MultiFidelityDataManager
from fidelityfusion_tpu.ops.kernels import Kernel
from fidelityfusion_tpu.train.fit import (
    fit,
    fit_restarts,
    gp_restart_batch,
    perturb_params,
    stack_params,
)


def stage_x(data_manager, i: int, x_raw) -> jnp.ndarray:
    """Normalize raw test inputs with stage i's x-statistics (stage i's GP
    was trained in that space); pass-through if no normalizer exists.
    Pure jnp ops so the whole forward cascade stays jit/grad-traceable
    (acquisition optimization differentiates through it)."""
    x = jnp.asarray(x_raw, jnp.float32)
    norm = data_manager.normalizelayer.get(i)
    if norm is None:
        return x
    return (x - jnp.asarray(norm.x_mean, jnp.float32)) / (
        jnp.asarray(norm.x_std, jnp.float32) + 1e-10
    )


class AR:
    """Autoregressive multi-fidelity model (Kennedy & O'Hagan)."""

    def __init__(
        self,
        fidelity_num: int,
        kernel_list: Sequence[Kernel],
        rho_init: float = 1.0,
        if_nonsubset: bool = False,
        input_dim: int = 1,
    ):
        self.fidelity_num = fidelity_num
        self.gp_list: List[CIGP] = [CIGP(kernel=k) for k in kernel_list]
        self.if_nonsubset = if_nonsubset
        self.input_dim = input_dim
        self.params = {
            "gp": [gp.init_params(input_dim) for gp in self.gp_list],
            "rho": [
                jnp.asarray(rho_init, jnp.float32) for _ in range(fidelity_num - 1)
            ],
        }
        # per-stage residual standardization (shift, scale): residual targets
        # are O(0.1) while fidelity-0 data is O(1); standardizing each stage's
        # targets makes every NLML landscape O(1) and avoids the all-noise
        # local optimum the raw reference parametrization falls into.
        self.stage_norm = [(0.0, 1.0)] * fidelity_num

    # ------------------------------------------------- functional predict
    def export_posterior(
        self,
        data_manager: MultiFidelityDataManager,
        to_fidelity: Optional[int] = None,
        diag: bool = True,
        pad_multiple: Optional[int] = None,
    ):
        """(ARPosterior, state): the prediction cascade as a HASHABLE
        callable plus a pure-array state pytree.

        Jitted programs built around the returned callable key the jit
        cache on the (value-hashable) GP specs, so acquisition
        optimization inside a BO loop compiles once per shape bucket
        instead of once per iteration; ``pad_multiple`` pads each stage's
        training rows (masked, exactly-equivalent posterior) so the
        buckets persist as the dataset grows."""
        return _export_cascade(self, data_manager, to_fidelity, diag, pad_multiple)

    # ---------------------------------------------------------------- predict
    def forward(
        self,
        data_manager: MultiFidelityDataManager,
        x_test: jnp.ndarray,
        to_fidelity: Optional[int] = None,
        denormalize: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Prediction cascade (`AR_autoRegression.py:56-89`): fidelity-0 GP
        posterior plus rho-scaled residual GP posteriors stacked upward.

        ``x_test`` is RAW (unnormalized); each stage normalizes it with its
        own fidelity's x-statistics before evaluating that stage's GP.  (The
        reference instead normalizes x_test once with the *top* fidelity's
        normalizer, `AR_autoRegression.py:182`, which misaligns the lower
        stages' input spaces whenever the per-fidelity x-sets differ — a
        phase-shift bug for oscillatory targets that we fix here.)

        Returns (mean, full covariance): raw y units when ``denormalize``,
        else in the target fidelity's normalized-y space.
        """
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
                y_mean, y_var = (y_tr[0], y_tr[1]) if isinstance(y_tr, list) else (y_tr, None)
                m_res, c_res = self.gp_list[i].predict(
                    self.params["gp"][i],
                    jnp.asarray(x_tr, jnp.float32),
                    jnp.asarray(y_mean, jnp.float32),
                    xt_i,
                )
                # Consistent AR recombination: training fits res = y_hi - rho*y_lo,
                # so prediction is y_hi = rho*y_lo + res (legacy-stack semantics,
                # `multiscale_coupling/Residual.py:20-34`; the current-stack
                # reference instead computes y_lo + rho*res at
                # `AR_autoRegression.py:84-85`, which is only consistent when
                # rho ~= 1 — a bug not replicated here).
                rho = self.params["rho"][i - 1]
                shift, scale = self.stage_norm[i]
                mean = rho * mean + (shift + scale * m_res)
                cov = rho**2 * cov + scale**2 * c_res
        if denormalize:
            norm = data_manager.normalizelayer[fidelity_level]
            mean = mean * float(norm.y_std) + float(norm.y_mean)
            cov = cov * float(norm.y_std) ** 2
        return mean, cov

    __call__ = forward


def train_AR(
    model: AR,
    data_manager: MultiFidelityDataManager,
    max_iter: int = 100,
    lr_init: float = 1e-2,
    n_restarts: int = 4,
    seed: int = 0,
    debugger=None,
    pad_multiple: Optional[int] = None,
    n_mesh=None,
    nshard_min_rows: int = 2048,
) -> List[jnp.ndarray]:
    """Sequential per-fidelity training (`AR_autoRegression.py:92-140`).

    Stage 0 fits the base GP on raw fidelity-0 data; stage i >= 1 fits the
    residual GP on ``y_hi - rho_i * y_lo`` over the subset (or the imputed
    non-subset fill data with variance targets).  Each stage is one
    compiled scan; with ``n_restarts > 1`` the stage loop is vmapped over
    jittered initializations and the best final NLML wins.

    ``n_mesh`` (round 5): a `jax.sharding.Mesh` with an ``"n"`` axis
    (optionally an ``"r"`` restart axis — `parallel/nsharded.py:
    make_rn_mesh`).  Stages with at least ``nshard_min_rows`` training
    rows then train through the n-axis-sharded distributed factorization
    (`parallel/nsharded.py:fit_restarts_nsharded` — the restart ladder
    rides the r axis, the Gram/Cholesky rows ride the n axis), so one
    call trains a cascade whose large stages exceed a single chip.
    Smaller stages keep the single-device path.  Non-subset stages with
    imputed-variance targets stay unsharded (documented limitation: the
    variance target depends on rho).

    Returns the list of per-stage loss histories (for n-sharded stages,
    the per-restart final NLML vector).
    """
    histories = []
    key = jax.random.PRNGKey(seed)
    for i_fid in range(model.fidelity_num):
        if i_fid == 0:
            x_low, y_low = data_manager.get_data(0, normal=True)
            gp = model.gp_list[0]
            if pad_multiple:
                x_low, y_low, mask0 = pad_with_mask(x_low, y_low, pad_multiple)
            else:
                x_low = jnp.asarray(x_low, jnp.float32)
                y_low = jnp.asarray(y_low, jnp.float32)
                mask0 = None

            stage_params = model.params["gp"][0]
            if (n_mesh is not None and mask0 is None
                    and x_low.shape[0] >= nshard_min_rows):
                stage_params, hist = _run_stage_nsharded(
                    gp, stage_params, x_low, y_low, None, n_mesh,
                    max_iter, lr_init, n_restarts,
                    jax.random.fold_in(key, i_fid),
                )
            else:
                # gp.nll is a bound method of a frozen-dataclass spec:
                # stable jit-cache identity, so BO-loop retrains at the
                # same shape bucket reuse one compiled program
                # (see train/fit.py)
                stage_params, hist = _run_stage(
                    _CigpNLL(gp), stage_params, max_iter, lr_init,
                    n_restarts, jax.random.fold_in(key, i_fid),
                    kernel_spec=gp.kernel, x=x_low,
                    loss_args=(x_low, y_low, None, mask0),
                )
            model.params["gp"][0] = stage_params
        else:
            if model.if_nonsubset:
                subset_x, y_low_p, y_high_p = data_manager.get_nonsubset_fill_data(
                    model, i_fid - 1, i_fid
                )
                sx = jnp.asarray(subset_x, jnp.float32)
                yl_m = jnp.asarray(y_low_p[0], jnp.float32)
                yl_v = jnp.asarray(y_low_p[1], jnp.float32)
                yh_m = jnp.asarray(y_high_p[0], jnp.float32)
                yh_v = jnp.asarray(y_high_p[1], jnp.float32)
                gp = model.gp_list[i_fid]

                rho0 = model.params["rho"][i_fid - 1]
                shift, scale = _residual_norm(yh_m - rho0 * yl_m)
                model.stage_norm[i_fid] = (shift, scale)
                if pad_multiple:
                    sx_t, yl_m_t, mask_ns = pad_with_mask(sx, yl_m, pad_multiple)
                    _, yl_v_t, _ = pad_with_mask(sx, yl_v, pad_multiple)
                    _, yh_m_t, _ = pad_with_mask(sx, yh_m, pad_multiple)
                    _, yh_v_t, _ = pad_with_mask(sx, yh_v, pad_multiple)
                else:
                    sx_t, yl_m_t, yl_v_t, yh_m_t, yh_v_t, mask_ns = (
                        sx, yl_m, yl_v, yh_m, yh_v, None
                    )
                loss_i = _ResidualVarLoss(gp)
                loss_args_i = (
                    sx_t, yl_m_t, yl_v_t, yh_m_t, yh_v_t,
                    jnp.float32(shift), jnp.float32(scale), mask_ns,
                )
            else:
                _, y_low, subset_x, y_high = data_manager.get_overlap_input_data(
                    i_fid - 1, i_fid, normal=True
                )
                gp = model.gp_list[i_fid]
                if pad_multiple:
                    sx, yl, mask_i = pad_with_mask(subset_x, y_low, pad_multiple)
                    _, yh, _ = pad_with_mask(subset_x, y_high, pad_multiple)
                else:
                    sx = jnp.asarray(subset_x, jnp.float32)
                    yl = jnp.asarray(y_low, jnp.float32)
                    yh = jnp.asarray(y_high, jnp.float32)
                    mask_i = None

                rho0 = model.params["rho"][i_fid - 1]
                shift, scale = _residual_norm(
                    jnp.asarray(y_high, jnp.float32)
                    - rho0 * jnp.asarray(y_low, jnp.float32)
                )
                model.stage_norm[i_fid] = (shift, scale)
                loss_i = _ResidualLoss(gp)
                loss_args_i = (
                    sx, yl, yh, jnp.float32(shift), jnp.float32(scale), mask_i,
                )

            stage_params = {
                "gp": model.params["gp"][i_fid],
                "rho": model.params["rho"][i_fid - 1],
            }
            if (n_mesh is not None and not model.if_nonsubset
                    and not pad_multiple
                    and sx.shape[0] >= nshard_min_rows):
                shift_i, scale_i = model.stage_norm[i_fid]
                stage_params, hist = _run_stage_nsharded(
                    gp, stage_params, sx, None,
                    (yl, yh, jnp.float32(shift_i), jnp.float32(scale_i)),
                    n_mesh, max_iter, lr_init, n_restarts,
                    jax.random.fold_in(key, i_fid), gp_field="gp",
                )
            else:
                stage_params, hist = _run_stage(
                    loss_i, stage_params, max_iter, lr_init, n_restarts,
                    jax.random.fold_in(key, i_fid),
                    kernel_spec=gp.kernel, x=sx, gp_field="gp",
                    loss_args=loss_args_i,
                )
            model.params["gp"][i_fid] = stage_params["gp"]
            model.params["rho"][i_fid - 1] = stage_params["rho"]

            # register the final residual dataset for the prediction cascade
            # (`AR_autoRegression.py:131-132`)
            # register the standardized residual dataset; forward rescales
            # by stage_norm when recombining
            rho = stage_params["rho"]
            shift, scale = model.stage_norm[i_fid]
            if model.if_nonsubset:
                res_mean = np.asarray((yh_m - rho * yl_m - shift) / scale)
                res_var = np.asarray(jnp.abs(yh_v - rho * yl_v) / scale**2)
                data_manager.add_data(
                    raw_fidelity_name=f"res-{i_fid}",
                    fidelity_index=None,
                    x=np.asarray(sx),
                    y=[res_mean, res_var],
                )
            else:
                res_mean = np.asarray((yh - rho * yl - shift) / scale)
                sx_store = np.asarray(sx)
                if pad_multiple:
                    # store only the live rows: padded zero-rows must never
                    # enter the prediction cascade as training data
                    n_live = int(np.sum(np.asarray(mask_i)))
                    sx_store = sx_store[:n_live]
                    res_mean = res_mean[:n_live]
                data_manager.add_data(
                    raw_fidelity_name=f"res-{i_fid}",
                    fidelity_index=None,
                    x=sx_store,
                    y=[res_mean, None],
                )
        histories.append(hist)
        if debugger is not None:
            debugger.record_stage(i_fid, hist)
    return histories


def _export_cascade(model, data_manager, to_fidelity=None, diag=True,
                    pad_multiple=None):
    """Shared export for rho-residual cascade models (AR; ResGP with
    rho fixed at 1 — models without a "rho" param get rho=1 stages)."""
    level = (
        to_fidelity if to_fidelity is not None else model.fidelity_num - 1
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
            rho = jnp.float32(1.0)
            shift, scale = jnp.float32(0.0), jnp.float32(1.0)
        else:
            x_tr, y_tr = data_manager.get_data_by_name(f"res-{i}")
            y_use = y_tr[0] if isinstance(y_tr, list) else y_tr
            rho = (
                jnp.asarray(model.params["rho"][i - 1], jnp.float32)
                if "rho" in model.params else jnp.float32(1.0)
            )
            s_, c_ = model.stage_norm[i]
            shift, scale = jnp.float32(s_), jnp.float32(c_)
        if pad_multiple:
            x_p, y_p, mask = pad_with_mask(x_tr, y_use, pad_multiple)
        else:
            x_p = jnp.asarray(x_tr, jnp.float32)
            y_p = jnp.asarray(y_use, jnp.float32)
            mask = None
        # one-time per-stage factorization: train data is frozen at
        # export, so each acquisition call later is GEMM-only instead of
        # the reference's per-call O(n^3) re-Cholesky (SURVEY §3.2,
        # `AR_autoRegression.py:56-89`)
        cache = model.gp_list[i].posterior_cache(
            model.params["gp"][i], x_p, y_p, mask=mask
        )
        stages.append(
            {
                "x": x_p, "cache": cache, "mask": mask,
                "gp": model.params["gp"][i],
                "rho": rho, "shift": shift, "scale": scale,
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
    return ARPosterior(tuple(model.gp_list), level, diag), state


@dataclasses.dataclass(frozen=True)
class ARPosterior:
    """The AR prediction cascade as a hashable functional: all data and
    parameters arrive via the ``state`` pytree (see `AR.export_posterior`),
    so jitted consumers (acquisition optimizers, imputation) compile once
    per shape bucket and reuse the program as state values change.

    Semantics identical to `AR.forward` (raw x in, raw y out; consistent
    rho-recombination; per-stage x-normalization).  ``diag`` selects the
    O(n^2 m) diagonal-variance fast path for acquisition scoring.

    Each stage's factorization is precomputed at export time
    (`CIGP.posterior_cache`), so a call does only cross-Gram + GEMMs —
    no per-call Cholesky (the reference re-factorizes every stage on
    every forward, `AR_autoRegression.py:56-89`)."""

    gps: tuple  # per-stage CIGP specs (frozen dataclasses -> hashable)
    to_fidelity: int
    diag: bool = True

    def __call__(self, state, x_raw):
        x_raw = jnp.asarray(x_raw, jnp.float32)
        mean = var = None
        for i in range(self.to_fidelity + 1):
            st = state["stages"][i]
            xt = (x_raw - st["x_mean"]) / st["x_std"]
            predict = (
                self.gps[i].predict_diag_cached if self.diag
                else self.gps[i].predict_cached
            )
            m, v = predict(st["gp"], st["cache"], st["x"], xt,
                           mask=st["mask"])
            if i == 0:
                mean, var = m, v
            else:
                rho, shift, scale = st["rho"], st["shift"], st["scale"]
                mean = rho * mean + (shift + scale * m)
                var = rho**2 * var + scale**2 * v
        y_mean, y_std = state["y_norm"]
        return mean * y_std + y_mean, var * y_std**2


@dataclasses.dataclass(frozen=True)
class _ResidualLoss:
    """Subset-mode stage loss: NLML of the standardized residual
    ``(y_hi - rho*y_lo - shift)/scale`` — a frozen-dataclass callable so
    equal GP specs share one jit-compiled training program across calls
    (train/fit.py cached path)."""

    gp: CIGP

    def __call__(self, p, sx, yl, yh, shift, scale, mask):
        res_mean = (yh - p["rho"] * yl - shift) / scale
        return self.gp.nll(p["gp"], sx, res_mean, mask=mask)


@dataclasses.dataclass(frozen=True)
class _ResidualVarLoss:
    """Non-subset stage loss: imputed targets carry variances
    (`MF_data.py:253-303` semantics), rho gets gradients through both."""

    gp: CIGP

    def __call__(self, p, sx, yl_m, yl_v, yh_m, yh_v, shift, scale, mask=None):
        rho = p["rho"]
        res_mean = (yh_m - rho * yl_m - shift) / scale
        res_var = jnp.abs(yh_v - rho * yl_v) / scale**2
        return self.gp.nll(p["gp"], sx, res_mean, y_var=res_var, mask=mask)


def _blocked_variant(loss_fn, n_rows: int):
    """For vmapped restart sweeps on large stages, swap the loss's CIGP
    spec to the GEMM-only batched NLML (`ops/blocked.py`): XLA's batched
    Cholesky/triangular-solve serialize over the restart axis on a single
    TPU core, and the solve-free path measures ~1.4x faster restart steps
    at n=1024, R=32 (BASELINE.md).  Un-batched or small stages keep the
    fused path (blocked is slower there).  Works on CIGP bound ``nll``
    methods and on frozen-dataclass losses with a ``gp: CIGP`` field;
    equal inputs map to equal outputs, preserving the compiled-program
    cache (`train/fit.py`)."""
    if n_rows < 320:
        return loss_fn
    self_obj = getattr(loss_fn, "__self__", None)
    if isinstance(self_obj, CIGP) and loss_fn.__name__ == "nll":
        # a frozen wrapper, not a bound method: bound methods of distinct
        # (even equal) instances compare unequal, which would defeat the
        # jit static-arg cache across retrains
        return _CigpNLL(dataclasses.replace(self_obj, blocked_nll=True))
    gp = getattr(loss_fn, "gp", None)
    if isinstance(gp, CIGP) and dataclasses.is_dataclass(loss_fn):
        return dataclasses.replace(
            loss_fn, gp=dataclasses.replace(gp, blocked_nll=True)
        )
    return loss_fn


@dataclasses.dataclass(frozen=True)
class _CigpNLL:
    """`CIGP.nll` as a hashable, equality-stable callable."""

    gp: CIGP

    def __call__(self, p, x, y, y_var=None, mask=None):
        return self.gp.nll(p, x, y, y_var=y_var, mask=mask)


def _run_stage(loss_fn, params, steps, lr, n_restarts, key,
               kernel_spec=None, x=None, gp_field=None, loss_args=None,
               aux0=None):
    """Run one stage's Adam scan; with restarts, vmap over a batch of
    initializations.  When ``kernel_spec``/``x`` are given, the batch is the
    deterministic length-scale ladder (`train/fit.py:gp_restart_batch`)
    applied to the GP subtree (``params[gp_field]`` or ``params`` itself);
    otherwise random jitter.  ``loss_args`` selects the cached-program
    path (stable-identity ``loss_fn``; see `train/fit.py:fit`).

    ``aux0``: single (unbatched) aux carry for aux-threading losses
    (e.g. the HOGP tracked eigenbasis) — broadcast across restarts here.
    Aux losses bypass `_blocked_variant` (their signature differs and the
    blocked swap targets CIGP losses)."""
    if n_restarts <= 1:
        result = fit(loss_fn, params, steps=steps, lr=lr, loss_args=loss_args,
                     aux0=aux0)
        return result.params, result.losses
    if x is not None and aux0 is None:
        loss_fn = _blocked_variant(loss_fn, x.shape[0])
    if kernel_spec is not None and x is not None:
        gp_params = params[gp_field] if gp_field else params
        gp_inits = gp_restart_batch(kernel_spec, gp_params, x, n_restarts, key)
        if gp_field:
            inits = [{**params, gp_field: g} for g in gp_inits]
        else:
            inits = gp_inits
        batch = stack_params(inits)
    else:
        batch = perturb_params(key, params, n=n_restarts)
    aux_batch = None
    if aux0 is not None:
        aux_batch = jax.tree_util.tree_map(
            lambda a: jnp.broadcast_to(a, (n_restarts,) + a.shape), aux0
        )
    best, result = fit_restarts(loss_fn, batch, steps=steps, lr=lr,
                                loss_args=loss_args, aux0=aux_batch)
    return best, result.losses


def _run_stage_nsharded(gp, params, x, y, residual, mesh, steps, lr,
                        n_restarts, key, gp_field=None, y_var=None,
                        lift=None):
    """n-axis-sharded stage runner (round 5): the same deterministic
    length-scale restart ladder as `_run_stage`, trained through
    `parallel/nsharded.py:fit_restarts_nsharded` — restarts ride the
    mesh's ``"r"`` axis when present (and R divides it), the
    Gram/factorization rows ride ``"n"``.  Returns
    ``(best_params, per_restart_final_losses)``."""
    from fidelityfusion_tpu.parallel.nsharded import fit_restarts_nsharded

    n_restarts = max(1, n_restarts)
    gp_params = params[gp_field] if gp_field else params
    gp_inits = gp_restart_batch(gp.kernel, gp_params, x, n_restarts, key)
    if gp_field:
        inits = [{**params, gp_field: g} for g in gp_inits]
    else:
        inits = gp_inits
    batch = stack_params(inits)
    r_axis = None
    if "r" in mesh.axis_names and n_restarts % int(mesh.shape["r"]) == 0:
        r_axis = "r"
    best, final = fit_restarts_nsharded(
        gp, batch, x, y, mesh, steps=steps, lr=lr, r_axis=r_axis,
        residual=residual, y_var=y_var, lift=lift,
    )
    return best, final


def pad_with_mask(x, y, pad_multiple: int):
    """Pad (x, y) row counts up to the next multiple of ``pad_multiple``
    and return (x_pad, y_pad, mask).  With padding, stage shapes stay
    constant as BO datasets grow, so the jitted training scan is compiled
    ONCE per bucket instead of once per dataset size (SURVEY.md §7
    hard-part #1); the masked NLML is exactly the unpadded one
    (`ops/linalg.py`)."""
    import math as _math

    from fidelityfusion_tpu.ops import linalg as _L

    n = x.shape[0]
    n_pad = int(_math.ceil(n / pad_multiple) * pad_multiple)
    return (
        _L.pad_rows(jnp.asarray(x, jnp.float32), n_pad),
        _L.pad_rows(jnp.asarray(y, jnp.float32), n_pad),
        _L.row_mask(n, n_pad),
    )


def _residual_norm(res) -> tuple:
    """(shift, scale) for per-stage target standardization; scale floored to
    avoid degenerate zero-residual stages."""
    shift = float(jnp.mean(res))
    scale = float(jnp.std(res))
    if not np.isfinite(scale) or scale < 1e-8:
        shift, scale = 0.0, 1.0
    return shift, scale
