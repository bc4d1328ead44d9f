from .mesh import (make_mesh, pbs_sharding_specs, shard_lwe_batch,
                   shard_server_key_tree)

__all__ = ["make_mesh", "pbs_sharding_specs", "shard_lwe_batch",
           "shard_server_key_tree"]
