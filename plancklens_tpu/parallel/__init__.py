from .mesh import (make_mesh, sims_sharding, maps_sharding, shard_batch,
                   shard_sht, ShardedIVFS)
