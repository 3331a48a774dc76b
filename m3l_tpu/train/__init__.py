from .mesh import make_mesh, shard_param_state, data_sharding, replicated  # noqa: F401
