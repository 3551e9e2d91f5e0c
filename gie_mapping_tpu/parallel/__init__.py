from .mesh import make_mesh, shard_state, shard_global_map, canvas_sharding, pool_sharding
