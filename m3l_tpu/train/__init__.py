from .mesh import make_mesh, shard_param_state, data_sharding, replicated  # noqa: F401
from .trainer import Trainer  # noqa: F401
from .checkpoint import save_checkpoint, load_checkpoint, restore_module_state, latest_checkpoint  # noqa: F401
