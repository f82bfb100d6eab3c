from .mesh import make_mesh, sims_sharding, shard_batch
