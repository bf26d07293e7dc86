from .mesh import make_mesh
from .sharding import (
    batch_specs,
    cache_spec,
    param_specs,
    shard_engine_arrays,
)
