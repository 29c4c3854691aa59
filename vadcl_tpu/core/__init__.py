from vadcl_tpu.core.config import (
    ClusterConfig,
    Config,
    DataConfig,
    EvalConfig,
    MeshConfig,
    ModelConfig,
    OptimConfig,
    ScheduleConfig,
    preset,
)
from vadcl_tpu.core.dtypes import DTypePolicy
from vadcl_tpu.core.mesh import make_mesh, data_sharding, replicate_sharding
from vadcl_tpu.core.rng import RngStream

__all__ = [
    "ClusterConfig",
    "Config",
    "DataConfig",
    "EvalConfig",
    "MeshConfig",
    "ModelConfig",
    "OptimConfig",
    "ScheduleConfig",
    "preset",
    "DTypePolicy",
    "make_mesh",
    "data_sharding",
    "replicate_sharding",
    "RngStream",
]
