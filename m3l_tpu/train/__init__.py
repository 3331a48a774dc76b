from .mesh import make_mesh, shard_param_state, data_sharding, replicated  # noqa: F401
from .trainer import Trainer  # noqa: F401
from .checkpoint import save_checkpoint, load_checkpoint, restore_module_state, latest_checkpoint  # noqa: F401
from .distributed import initialize_distributed, get_local_rank, get_world_size, is_main_process, slurm_requeue  # noqa: F401
