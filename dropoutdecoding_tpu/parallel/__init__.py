from .mesh import make_mesh, shard_llava_params, shard_cache, data_sharding
