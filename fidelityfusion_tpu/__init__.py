"""fidelityfusion_tpu: TPU-native multi-fidelity Gaussian-process framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
IceLab-X/FidelityFusion: multi-fidelity GP surrogates (AR, NAR, ResGP,
CAR/ContinuAR, GAR, CIGAR over CIGP/HOGP/FIDES bases), multi-fidelity
Bayesian optimization, and the synthetic benchmark zoo — built TPU-first:
pure-functional parameter pytrees, whole training loops compiled as
`lax.scan`, vmapped random restarts, and device-mesh sharding for the
embarrassingly parallel axes (restarts, BO candidates, sweeps).
"""

__version__ = "0.1.0"

from fidelityfusion_tpu.models.data_manager import (  # noqa: F401
    MultiFidelityDataManager,
    Normalizer,
)
