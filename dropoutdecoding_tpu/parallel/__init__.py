from .mesh import (
    make_mesh,
    shard_llava_params,
    shard_llavanext_params,
    shard_instructblip_params,
    shard_cache,
    data_sharding,
)
