from fidelityfusion_tpu.models.cigp import CIGP, GPBasic  # noqa: F401
from fidelityfusion_tpu.models.data_manager import (  # noqa: F401
    MultiFidelityDataManager,
    Normalizer,
)
from fidelityfusion_tpu.models.ar import AR, train_AR  # noqa: F401
from fidelityfusion_tpu.models.nar import NAR, train_NAR  # noqa: F401
from fidelityfusion_tpu.models.resgp import ResGP, train_ResGP  # noqa: F401
from fidelityfusion_tpu.models.car import (  # noqa: F401
    ContinuousAutoRegression,
    ContinuousAutoRegressionLarge,
    train_CAR,
    train_CAR_large,
)
from fidelityfusion_tpu.models.hogp import HOGP, HOGPState  # noqa: F401
from fidelityfusion_tpu.models.gar import GAR, train_GAR  # noqa: F401
from fidelityfusion_tpu.models.cigar import CIGAR, train_CIGAR  # noqa: F401
from fidelityfusion_tpu.models.fides import FIDES, FidelityBounds  # noqa: F401
from fidelityfusion_tpu.models.coupling import TensorLinear  # noqa: F401
from fidelityfusion_tpu.models.two_fidelity import (  # noqa: F401
    ARTwoFidelity,
    GARTwoFidelity,
    NARTwoFidelity,
    ResGPTwoFidelity,
    find_subsets_and_indexes,
    train_AR_twofidelity,
    train_GAR_twofidelity,
    train_NAR_twofidelity,
    train_ResGP_twofidelity,
)
