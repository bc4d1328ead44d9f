from .mesh import (make_mesh, pbs_sharding_specs, replicate_tree,
                   shard_lwe_batch, shard_map_kspbs, shard_server_key_tree)

__all__ = ["make_mesh", "pbs_sharding_specs", "replicate_tree",
           "shard_lwe_batch", "shard_map_kspbs", "shard_server_key_tree"]
