from fidelityfusion_tpu.experiments.metrics import (  # noqa: F401
    calculate_metrix,
    gaussian_nll,
    nrmse,
    r2,
    rmse,
)
