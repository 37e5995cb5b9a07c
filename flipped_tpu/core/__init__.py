from .config import (DataConfig, MeshConfig, ModelConfig, RunConfig,
                     TrainConfig, MODEL_PRESETS, get_args_parser,
                     run_config_from_args, validate_audio_flags)
from .mesh import (DP_AXIS, TP_AXIS, batch_sharding, make_mesh, param_pspec,
                   param_shardings, replicated)
from . import dtypes

__all__ = [
    "DataConfig", "MeshConfig", "ModelConfig", "RunConfig", "TrainConfig",
    "MODEL_PRESETS", "get_args_parser", "run_config_from_args",
    "validate_audio_flags", "DP_AXIS", "TP_AXIS", "batch_sharding",
    "make_mesh", "param_pspec", "param_shardings", "replicated", "dtypes",
]
