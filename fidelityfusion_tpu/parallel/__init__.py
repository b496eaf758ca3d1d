from fidelityfusion_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    shard_leading_axis,
    sharded_acq_argmax,
    sharded_fit_restarts,
    sharded_posterior_mean,
)
