from .mesh import create_mesh, DATA_AXIS, MODEL_AXIS
from .sharding import gpt_param_specs, batch_spec, shard_params

__all__ = [
    "create_mesh",
    "DATA_AXIS",
    "MODEL_AXIS",
    "gpt_param_specs",
    "batch_spec",
    "shard_params",
]
