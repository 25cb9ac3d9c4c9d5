from v1t_tpu.models.registry import register_core, register_readout, get_core, get_readout
from v1t_tpu.models.model import Model, build_model, model_regularizer

# import for registration side-effects
from v1t_tpu.models.cores import vit as _vit  # noqa: F401
from v1t_tpu.models.cores import cct as _cct  # noqa: F401
from v1t_tpu.models.cores import stacked2d as _stacked2d  # noqa: F401
from v1t_tpu.models.cores import stn as _stn  # noqa: F401
from v1t_tpu.models.cores import mixer as _mixer  # noqa: F401
from v1t_tpu.models.cores import linear as _linear_core  # noqa: F401
from v1t_tpu.models.cores import random as _random_core  # noqa: F401
from v1t_tpu.models.readouts import gaussian2d as _gaussian2d  # noqa: F401
from v1t_tpu.models.readouts import dense as _dense_readout  # noqa: F401
from v1t_tpu.models.readouts import linear as _linear_readout  # noqa: F401
from v1t_tpu.models.readouts import random as _random_readout  # noqa: F401

__all__ = [
    "Model",
    "build_model",
    "model_regularizer",
    "register_core",
    "register_readout",
    "get_core",
    "get_readout",
]
