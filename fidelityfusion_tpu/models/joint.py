"""Joint multi-fidelity training: one optimizer step updates ALL fidelities.

TPU-native re-design of the legacy stack's training contract
(`MFGP_ver2023May/README.md:36-75`, driven by `mfgp_demo.py:118-127`):
instead of the current stack's sequential per-fidelity stages, a single
joint loss

    L(params) = sum_i NLML_i(stage-i data, params)

is minimized with one Adam over the full parameter pytree — rho/b and all
kernels co-adapt (the legacy `compute_loss` accumulation,
`MFGP_ver2023May/AR_AutoRegression.py:206-255`).  Subset-structured data
only: stage datasets are built once outside jit (the legacy non-subset
path re-imputes inside the epoch loop via `self.forward`, which cannot be
a static jit graph; use the staged trainers for non-subset data).

Works for AR, ResGP, NAR, and CAR models from `models/`; after training
the stage residual datasets are registered exactly as the staged trainers
do, so `model.forward` works unchanged.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from fidelityfusion_tpu.models.ar import AR, _residual_norm
from fidelityfusion_tpu.models.car import ContinuousAutoRegression
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
) -> jnp.ndarray:
    """Jointly train an AR / ResGP / NAR / CAR model (subset data).

    Returns the loss history.  Residual/concat datasets and stage norms are
    registered afterwards from the final parameters so the prediction
    cascade behaves identically to staged training.
    """
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

    raise TypeError(f"joint training not supported for {type(model).__name__}")
