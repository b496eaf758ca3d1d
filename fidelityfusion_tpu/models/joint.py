"""Joint multi-fidelity training: one optimizer step updates ALL fidelities.

TPU-native re-design of the legacy stack's training contract
(`MFGP_ver2023May/README.md:36-75`, driven by `mfgp_demo.py:118-127`):
instead of the current stack's sequential per-fidelity stages, a single
joint loss

    L(params) = sum_i NLML_i(stage-i data, params)

is minimized with one Adam over the full parameter pytree — rho/b and all
kernels co-adapt (the legacy `compute_loss` accumulation,
`MFGP_ver2023May/AR_AutoRegression.py:206-255`).

Non-subset data: the legacy contract re-imputes missing low-fidelity y
inside the epoch loop via `self.forward`
(`MFGP_ver2023May/AR_AutoRegression.py:180-203`), which cannot be one
static jit graph.  The TPU-native equivalent is STAGED IMPUTATION
(`train_joint_nonsubset`): training is split into a few rounds; before
each round the missing y_low are imputed with the current cascade (a
jitted predict at fixed shapes), then one compiled joint-Adam scan runs
on the rebuilt fixed-shape stage arrays.  Shapes never change across
rounds, so the round program compiles ONCE and is reused (the
frozen-dataclass loss + loss_args cached path of `train/fit.py`).

Works for AR, ResGP, NAR, and CAR models from `models/`; after training
the stage residual datasets are registered exactly as the staged trainers
do, so `model.forward` works unchanged.
"""

from __future__ import annotations

import dataclasses
import math

import jax.numpy as jnp
import numpy as np

from fidelityfusion_tpu.models.ar import AR, _residual_norm
from fidelityfusion_tpu.models.car import ContinuousAutoRegression
from fidelityfusion_tpu.models.cigar import CIGAR
from fidelityfusion_tpu.models.cigp import CIGP
from fidelityfusion_tpu.models.gar import GAR
from fidelityfusion_tpu.models.nar import NAR
from fidelityfusion_tpu.models.resgp import ResGP
from fidelityfusion_tpu.train.fit import fit


def _stage_data(model, dm):
    """Collect per-stage (x, y_low, y_high) arrays once (subset path)."""
    x0, y0 = dm.get_data(0, normal=True)
    stages = [(jnp.asarray(x0, jnp.float32), jnp.asarray(y0, jnp.float32), None)]
    for i in range(1, model.fidelity_num):
        _, yl, sx, yh = dm.get_overlap_input_data(i - 1, i, normal=True)
        stages.append(
            (
                jnp.asarray(sx, jnp.float32),
                jnp.asarray(yl, jnp.float32),
                jnp.asarray(yh, jnp.float32),
            )
        )
    return stages


def train_joint(
    model,
    data_manager,
    max_iter: int = 200,
    lr_init: float = 1e-2,
    rounds: int = 4,
) -> jnp.ndarray:
    """Jointly train an AR / ResGP / NAR / CAR model.

    Subset data: one compiled joint-Adam scan over all stage losses.
    Non-subset data (``model.if_nonsubset``): dispatches to
    `train_joint_nonsubset` (staged imputation; ``rounds`` controls the
    re-imputation cadence).

    Returns the loss history.  Residual/concat datasets and stage norms are
    registered afterwards from the final parameters so the prediction
    cascade behaves identically to staged training.
    """
    if getattr(model, "if_nonsubset", False):
        return train_joint_nonsubset(
            model, data_manager, max_iter=max_iter, lr_init=lr_init,
            rounds=rounds,
        )
    stages = _stage_data(model, data_manager)

    if isinstance(model, AR):
        norms = [
            (0.0, 1.0)
        ] + [
            _residual_norm(yh - model.params["rho"][i - 1] * yl)
            for i, (_, yl, yh) in enumerate(stages[1:], start=1)
        ]

        def loss_fn(p):
            total = model.gp_list[0].nll(p["gp"][0], stages[0][0], stages[0][1])
            for i, (sx, yl, yh) in enumerate(stages[1:], start=1):
                shift, scale = norms[i]
                res = (yh - p["rho"][i - 1] * yl - shift) / scale
                total = total + model.gp_list[i].nll(p["gp"][i], sx, res)
            return total

        result = fit(loss_fn, model.params, steps=max_iter, lr=lr_init)
        model.params = result.params
        model.stage_norm = norms
        for i, (sx, yl, yh) in enumerate(stages[1:], start=1):
            shift, scale = norms[i]
            res = np.asarray((yh - model.params["rho"][i - 1] * yl - shift) / scale)
            data_manager.add_data(f"res-{i}", None, np.asarray(sx), [res, None])
        return result.losses

    if isinstance(model, ResGP):
        norms = [(0.0, 1.0)] + [
            _residual_norm(yh - yl) for (_, yl, yh) in stages[1:]
        ]

        def loss_fn(p):
            total = model.gp_list[0].nll(p["gp"][0], stages[0][0], stages[0][1])
            for i, (sx, yl, yh) in enumerate(stages[1:], start=1):
                shift, scale = norms[i]
                total = total + model.gp_list[i].nll(
                    p["gp"][i], sx, (yh - yl - shift) / scale
                )
            return total

        result = fit(loss_fn, model.params, steps=max_iter, lr=lr_init)
        model.params = result.params
        model.stage_norm = norms
        for i, (sx, yl, yh) in enumerate(stages[1:], start=1):
            shift, scale = norms[i]
            data_manager.add_data(
                f"res-{i}", None, np.asarray(sx),
                [np.asarray((yh - yl - shift) / scale), None],
            )
        return result.losses

    if isinstance(model, NAR):
        concat = [
            (jnp.concatenate([sx, yl.reshape(len(sx), -1)], axis=-1), yh)
            for (sx, yl, yh) in stages[1:]
        ]

        def loss_fn(p):
            total = model.gp_list[0].nll(p["gp"][0], stages[0][0], stages[0][1])
            for i, (cx, yh) in enumerate(concat, start=1):
                total = total + model.gp_list[i].nll(p["gp"][i], cx, yh)
            return total

        result = fit(loss_fn, model.params, steps=max_iter, lr=lr_init)
        model.params = result.params
        for i, (cx, yh) in enumerate(concat, start=1):
            data_manager.add_data(
                f"concat-{i}", None, np.asarray(cx), [np.asarray(yh), None]
            )
        return result.losses

    if isinstance(model, ContinuousAutoRegression):
        norms = [(0.0, 1.0)] + [
            _residual_norm(yh - jnp.exp(model.params["b"]) * yl)
            for (_, yl, yh) in stages[1:]
        ]

        def loss_fn(p):
            total = model.gp_list[0].nll(p["gp"][0], stages[0][0], stages[0][1])
            for i, (sx, yl, yh) in enumerate(stages[1:], start=1):
                shift, scale = norms[i]
                res = (yh - jnp.exp(p["b"]) * yl - shift) / scale
                gp_p = ContinuousAutoRegression._bind_b(p["gp"][i], p["b"])
                total = total + model.gp_list[i].nll(gp_p, sx, res)
            return total

        result = fit(loss_fn, model.params, steps=max_iter, lr=lr_init)
        model.params = result.params
        model.stage_norm = norms
        for i, (sx, yl, yh) in enumerate(stages[1:], start=1):
            shift, scale = norms[i]
            res = np.asarray((yh - jnp.exp(model.params["b"]) * yl - shift) / scale)
            data_manager.add_data(f"res-{i}", None, np.asarray(sx), [res, None])
        return result.losses

    if isinstance(model, (GAR, CIGAR)):
        return _train_joint_tensor(model, data_manager, max_iter, lr_init)

    raise TypeError(f"joint training not supported for {type(model).__name__}")


# --------------------------------------------------------------------------
# Joint training for the tensor-output models (GAR / CIGAR)
# --------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class _JointGarLoss:
    """Joint NLML over a GAR cascade: per-stage HOGP Kronecker NLMLs with
    the TensorLinear lifts trained through the joint loss (the legacy
    8-model `compute_loss` contract covers GAR —
    `MFGP_ver2023May/GAR_GeneralizedAutoAR.py`, driven jointly by
    `mfgp_demo.py:118-127`).  Stage arrays are (sx, yl, yh, rv) quads;
    ``rv`` is the imputed residual variance ((n,) or a row of zeros — a
    zero diagonal addition is the subset case, so ONE loss spec serves
    both paths and the compiled program is shared)."""

    hogps: tuple
    tls: tuple
    norms: tuple  # per-stage (shift, scale) floats

    def __call__(self, p, x0, y0, *stage_arrays):
        total = self.hogps[0].nll(p["hogp"][0], x0, y0)
        for i in range(1, len(self.hogps)):
            sx, yl, yh, rv = stage_arrays[4 * (i - 1): 4 * i]
            shift, scale = self.norms[i]
            res = (yh - self.tls[i - 1].apply(p["tl"][i - 1], yl) - shift) / scale
            total = total + self.hogps[i].nll(p["hogp"][i], sx, res, y_var=rv)
        return total


@dataclasses.dataclass(frozen=True)
class _JointCigarLoss:
    """Joint NLML over a CIGAR cascade (flattened outputs through CIGP,
    the autokrigeability shortcut — `CIGAR_ConditionalIndependentGAR.py`)."""

    gps: tuple
    tls: tuple
    norms: tuple

    def __call__(self, p, x0, y0, *stage_arrays):
        total = self.gps[0].nll(p["gp"][0], x0, y0)
        for i in range(1, len(self.gps)):
            sx, yl, yh, rv = stage_arrays[4 * (i - 1): 4 * i]
            shift, scale = self.norms[i]
            tl = self.tls[i - 1]
            lift = tl.apply(p["tl"][i - 1],
                            yl.reshape((yl.shape[0],) + tl.l_shape))
            res = (yh - lift.reshape(lift.shape[0], -1) - shift) / scale
            total = total + self.gps[i].nll(p["gp"][i], sx, res, y_var=rv)
        return total


def _tensor_stage_arrays_subset(model, dm):
    """(x0, y0, stage quads) for GAR/CIGAR subset joint training; y kept
    in tensor form for GAR, flattened for CIGAR."""
    is_gar = isinstance(model, GAR)
    x0, y0 = dm.get_data(0, normal=True)
    x0 = jnp.asarray(x0, jnp.float32)
    y0 = jnp.asarray(y0, jnp.float32)
    if not is_gar:
        y0 = y0.reshape(len(y0), -1)
    quads = []
    for i in range(1, model.fidelity_num):
        _, yl, sx, yh = dm.get_overlap_input_data(i - 1, i, normal=True)
        sx = jnp.asarray(sx, jnp.float32)
        yl = jnp.asarray(yl, jnp.float32)
        yh = jnp.asarray(yh, jnp.float32)
        if is_gar:
            yl = yl.reshape((len(sx),) + model.data_shape_list[i - 1])
            yh = yh.reshape((len(sx),) + model.data_shape_list[i])
        else:
            yl = yl.reshape(len(sx), -1)
            yh = yh.reshape(len(sx), -1)
        rv = jnp.zeros((len(sx),), jnp.float32)
        quads.append((sx, yl, yh, rv))
    return x0, y0, quads


def _tensor_lift(model, i, p_tl, yl):
    if isinstance(model, GAR):
        return model.tl_list[i - 1].apply(p_tl, yl)
    return model._apply_tl_flat(i - 1, p_tl, yl)


def _register_tensor_stages(model, dm, x0, y0, quads):
    """Re-register res-i datasets and (for GAR) posterior states from the
    CURRENT params so `model.forward` reflects the joint fit."""
    is_gar = isinstance(model, GAR)
    if is_gar:
        _, state0 = model.hogp_list[0].nll_with_state(
            model.params["hogp"][0], x0, y0
        )
        model.states[0] = state0
    for i, (sx, yl, yh, rv) in enumerate(quads, start=1):
        shift, scale = model.stage_norm[i]
        p_tl = model.params["tl"][i - 1]
        res = np.asarray((yh - _tensor_lift(model, i, p_tl, yl) - shift) / scale)
        dm.data_dict.pop(f"res-{i}", None)
        dm.add_data(f"res-{i}", None, np.asarray(sx), [res, None])
        if is_gar:
            has_var = bool(np.any(np.asarray(rv)))
            _, st = model.hogp_list[i].nll_with_state(
                model.params["hogp"][i], sx, jnp.asarray(res, jnp.float32),
                y_var=rv if has_var else None,
            )
            model.states[i] = st


def _train_joint_tensor(model, dm, max_iter, lr_init):
    """Subset-path joint training for GAR/CIGAR: one Adam over every
    stage's HOGP/CIGP NLML with the TensorLinear lifts co-adapting."""
    x0, y0, quads = _tensor_stage_arrays_subset(model, dm)
    # residual standardization fixed from the INITIAL lifts (same policy
    # as the staged trainers: norms are frozen before the stage trains)
    for i, (sx, yl, yh, _rv) in enumerate(quads, start=1):
        model.stage_norm[i] = _residual_norm(
            yh - _tensor_lift(model, i, model.params["tl"][i - 1], yl)
        )
    norms = tuple(
        (float(s), float(c)) for s, c in model.stage_norm
    )
    if isinstance(model, GAR):
        loss_fn = _JointGarLoss(
            tuple(model.hogp_list), tuple(model.tl_list), norms
        )
    else:
        loss_fn = _JointCigarLoss(
            tuple(model.gp_list), tuple(model.tl_list), norms
        )
    flat = [a for quad in quads for a in quad]
    result = fit(loss_fn, model.params, steps=max_iter, lr=lr_init,
                 loss_args=(x0, y0, *flat))
    model.params = result.params
    _register_tensor_stages(model, dm, x0, y0, quads)
    return result.losses


def _train_joint_tensor_nonsubset(model, dm, max_iter, lr_init, rounds):
    """Non-subset joint GAR/CIGAR via staged imputation (the same
    round structure as `train_joint_nonsubset`): before each round the
    missing low-fidelity fields are imputed with the CURRENT cascade —
    GAR's posterior states are refreshed from current params first, so
    round 0 imputes with the initialized model exactly like the legacy
    epoch loop does (`MFGP_ver2023May/AR_AutoRegression.py:180-203`) —
    then one compiled joint-Adam scan runs on fixed-shape stage arrays."""
    is_gar = isinstance(model, GAR)
    steps_per_round = max(1, math.ceil(max_iter / rounds))
    x0, y0 = dm.get_data(0, normal=True)
    x0 = jnp.asarray(x0, jnp.float32)
    y0 = jnp.asarray(y0, jnp.float32)
    if not is_gar:
        y0 = y0.reshape(len(y0), -1)

    all_losses = []
    norms = None
    for _r in range(rounds):
        if is_gar:
            _, state0 = model.hogp_list[0].nll_with_state(
                model.params["hogp"][0], x0, y0
            )
            model.states[0] = state0
        quads = []
        for i in range(1, model.fidelity_num):
            sx, y_low_p, y_high_p = dm.get_nonsubset_fill_data(
                model, i - 1, i
            )
            sx = jnp.asarray(sx, jnp.float32)
            yl = jnp.asarray(y_low_p[0], jnp.float32)
            yh = jnp.asarray(y_high_p[0], jnp.float32)
            if is_gar:
                yl = yl.reshape((len(sx),) + model.data_shape_list[i - 1])
                yh = yh.reshape((len(sx),) + model.data_shape_list[i])
            else:
                yl = yl.reshape(len(sx), -1)
                yh = yh.reshape(len(sx), -1)
            rv = jnp.abs(
                jnp.asarray(y_high_p[1], jnp.float32)
                - jnp.asarray(y_low_p[1], jnp.float32)
            ).reshape(-1)
            if norms is None:
                model.stage_norm[i] = _residual_norm(
                    yh - _tensor_lift(model, i, model.params["tl"][i - 1], yl)
                )
            shift, scale = model.stage_norm[i]
            rv = rv / jnp.float32(scale) ** 2
            quads.append((sx, yl, yh, rv))
            # register res-i (and GAR state i) NOW so fidelity i+1's
            # imputation cascade sees this stage
            _register_tensor_stages(model, dm, x0, y0, quads)
        if norms is None:
            norms = tuple((float(s), float(c)) for s, c in model.stage_norm)

        if is_gar:
            loss_fn = _JointGarLoss(
                tuple(model.hogp_list), tuple(model.tl_list), norms
            )
        else:
            loss_fn = _JointCigarLoss(
                tuple(model.gp_list), tuple(model.tl_list), norms
            )
        flat = [a for quad in quads for a in quad]
        result = fit(loss_fn, model.params, steps=steps_per_round,
                     lr=lr_init, loss_args=(x0, y0, *flat))
        model.params = result.params
        all_losses.append(result.losses)
        _register_tensor_stages(model, dm, x0, y0, quads)
    return jnp.concatenate(all_losses)


# --------------------------------------------------------------------------
# Non-subset joint training: staged imputation
# --------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class _JointRhoLoss:
    """Joint NLML over all stages of a rho-residual cascade (AR; ResGP via
    ``trainable_rho=False`` with rho fixed at 1).  Imputed low-fidelity
    targets carry variances, entering the stage covariance diagonal like
    the staged `_ResidualVarLoss` (`models/ar.py`).  Frozen dataclass =>
    equal specs share one compiled joint-Adam program across rounds."""

    gps: tuple  # per-stage CIGP specs
    norms: tuple  # per-stage (shift, scale) floats
    trainable_rho: bool

    def __call__(self, p, x0, y0, *stage_arrays):
        total = self.gps[0].nll(p["gp"][0], x0, y0)
        for i in range(1, len(self.gps)):
            sx, yl_m, yl_v, yh_m, yh_v = stage_arrays[5 * (i - 1): 5 * i]
            rho = p["rho"][i - 1] if self.trainable_rho else 1.0
            shift, scale = self.norms[i]
            res = (yh_m - rho * yl_m - shift) / scale
            res_var = jnp.abs(yh_v - rho * yl_v) / scale**2
            total = total + self.gps[i].nll(p["gp"][i], sx, res, y_var=res_var)
        return total


@dataclasses.dataclass(frozen=True)
class _JointNARLoss:
    """Joint NLML over a NAR cascade: stage i's GP input is the
    concatenation ``[x, y_low(x)]`` with imputed y_low where unobserved."""

    gps: tuple

    def __call__(self, p, x0, y0, *stage_arrays):
        total = self.gps[0].nll(p["gp"][0], x0, y0)
        for i in range(1, len(self.gps)):
            sx, yl_m, yl_v, yh_m, yh_v = stage_arrays[5 * (i - 1): 5 * i]
            cx = jnp.concatenate([sx, yl_m.reshape(sx.shape[0], -1)], axis=-1)
            total = total + self.gps[i].nll(
                p["gp"][i], cx, yh_m, y_var=yh_v + jnp.sum(yl_v) * 0.0
            )
        return total


def _joint_rho(model):
    """(trainable_rho, rho_values) for the rho-residual cascade models."""
    if isinstance(model, AR):
        return True, model.params["rho"]
    return False, [jnp.float32(1.0)] * (model.fidelity_num - 1)


def _register_stage_datasets(model, dm, stage_arrays):
    """(Re-)register the res-i / concat-i datasets from the CURRENT params
    so `model.forward` (and hence the next round's imputation) reflects
    them.  add_data appends on re-add, so stale entries are dropped first."""
    is_nar = isinstance(model, NAR)
    _, rhos = _joint_rho(model)
    for i in range(1, len(stage_arrays) // 5 + 1):
        sx, yl_m, yl_v, yh_m, yh_v = stage_arrays[5 * (i - 1): 5 * i]
        if is_nar:
            cx = np.concatenate(
                [np.asarray(sx), np.asarray(yl_m).reshape(len(sx), -1)], axis=-1
            )
            dm.data_dict.pop(f"concat-{i}", None)
            dm.add_data(f"concat-{i}", None, cx, [np.asarray(yh_m), None])
        else:
            rho = (
                model.params["rho"][i - 1] if isinstance(model, AR) else rhos[i - 1]
            )
            shift, scale = model.stage_norm[i]
            res = np.asarray((yh_m - rho * yl_m - shift) / scale)
            res_var = np.asarray(jnp.abs(yh_v - rho * yl_v) / scale**2)
            dm.data_dict.pop(f"res-{i}", None)
            dm.add_data(f"res-{i}", None, np.asarray(sx), [res, res_var])


def train_joint_nonsubset(
    model,
    data_manager,
    max_iter: int = 200,
    lr_init: float = 1e-2,
    rounds: int = 4,
) -> jnp.ndarray:
    """Joint training on NON-SUBSET data via staged imputation.

    The legacy contract imputes missing low-fidelity y inside every epoch
    via `self.forward` (`MFGP_ver2023May/AR_AutoRegression.py:180-203`).
    Here the imputation runs BETWEEN rounds: each round re-imputes with the
    current cascade (`get_nonsubset_fill_data`, a jitted predict) and then
    runs ``max_iter / rounds`` joint-Adam steps on fixed-shape stage
    arrays — the compiled program is reused across rounds.

    Supports AR, ResGP, NAR.  (The CAR joint formulation is the dedicated
    `CARLarge` model, `models/car.py`.)

    Returns the concatenated loss history (length ~= max_iter).
    """
    if isinstance(model, ContinuousAutoRegression):
        raise TypeError(
            "non-subset joint CAR: use CARLarge (the joint ContinuAR "
            "formulation, models/car.py) instead"
        )
    if isinstance(model, (GAR, CIGAR)):
        return _train_joint_tensor_nonsubset(
            model, data_manager, max_iter, lr_init, rounds
        )
    if not isinstance(model, (AR, ResGP, NAR)):
        raise TypeError(
            f"non-subset joint training not supported for {type(model).__name__}"
        )
    steps_per_round = max(1, math.ceil(max_iter / rounds))
    x0, y0 = data_manager.get_data(0, normal=True)
    x0 = jnp.asarray(x0, jnp.float32)
    y0 = jnp.asarray(y0, jnp.float32)

    trainable_rho, rhos = _joint_rho(model)
    all_losses = []
    norms = None
    for r in range(rounds):
        # ---- impute + rebuild stage arrays (fixed shapes across rounds)
        stage_arrays = []
        for i in range(1, model.fidelity_num):
            sx, y_low_p, y_high_p = data_manager.get_nonsubset_fill_data(
                model, i - 1, i
            )
            sx = jnp.asarray(sx, jnp.float32)
            yl_m = jnp.asarray(y_low_p[0], jnp.float32)
            yl_v = jnp.asarray(y_low_p[1], jnp.float32)
            yh_m = jnp.asarray(y_high_p[0], jnp.float32)
            yh_v = jnp.asarray(y_high_p[1], jnp.float32)
            if norms is None and not isinstance(model, NAR):
                # stage norms fixed at round 0 so the loss spec (and the
                # compiled program) is identical across rounds
                model.stage_norm[i] = _residual_norm(yh_m - rhos[i - 1] * yl_m)
            stage_arrays.extend([sx, yl_m, yl_v, yh_m, yh_v])
            # register res/concat-i NOW so fidelity i+1's imputation cascade
            # (and the next round's) sees this stage's current data
            _register_stage_datasets(model, data_manager, stage_arrays)
        if norms is None:
            norms = tuple(
                (float(s), float(c))
                for s, c in getattr(
                    model, "stage_norm", [(0.0, 1.0)] * model.fidelity_num
                )
            )

        if isinstance(model, NAR):
            loss_fn = _JointNARLoss(tuple(model.gp_list))
        else:
            loss_fn = _JointRhoLoss(tuple(model.gp_list), norms, trainable_rho)
        result = fit(
            loss_fn, model.params, steps=steps_per_round, lr=lr_init,
            loss_args=(x0, y0, *stage_arrays),
        )
        model.params = result.params
        all_losses.append(result.losses)
        _register_stage_datasets(model, data_manager, stage_arrays)
    return jnp.concatenate(all_losses)
