from fidelityfusion_tpu.data.pde import (  # noqa: F401
    generate_poisson_mf_dataset,
    heat_fields,
    poisson_fields,
)
