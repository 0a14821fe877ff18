from .mesh import make_mesh
from .sharding import shard_params, param_sharding_rules

__all__ = ["make_mesh", "shard_params", "param_sharding_rules"]
