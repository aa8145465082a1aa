from .mesh import make_mesh
from .sharding import batch_shardings, param_shardings, shard_params

__all__ = ["make_mesh", "param_shardings", "shard_params", "batch_shardings"]
