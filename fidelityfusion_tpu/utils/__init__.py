from fidelityfusion_tpu.utils.config import (  # noqa: F401
    Config,
    make_config,
    update_dict_with_default,
)
from fidelityfusion_tpu.utils.logging import LogDebugger, MFGPLog  # noqa: F401
from fidelityfusion_tpu.utils.checkpoint import (  # noqa: F401
    load_bo_state,
    restore_pytree,
    save_bo_state,
    save_pytree,
)
