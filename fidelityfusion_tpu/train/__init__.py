from fidelityfusion_tpu.train.fit import (  # noqa: F401
    FitResult,
    fit,
    fit_restarts,
    perturb_params,
)
