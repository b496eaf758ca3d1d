from fidelityfusion_tpu.ops import kernels, kron, linalg  # noqa: F401
