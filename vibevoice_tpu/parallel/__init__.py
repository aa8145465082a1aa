from .mesh import force_virtual_cpu_devices, make_mesh
from .sharding import (batch_shardings, infer_kv_tp, kv_cache_pspec,
                       param_pspecs, param_shardings, shard_params)

__all__ = ["make_mesh", "force_virtual_cpu_devices", "param_pspecs",
           "param_shardings", "shard_params", "batch_shardings",
           "infer_kv_tp", "kv_cache_pspec"]
