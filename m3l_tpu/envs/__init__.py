from .wrappers import FrameStack, ResizeDict, AddTactile  # noqa: F401
from .fake import FakeInsertionEnv  # noqa: F401
from .vec import SyncVecEnv, SubprocVecEnv, make_vec_env  # noqa: F401
from .factory import make_env  # noqa: F401
from .shm_vec import SharedMemoryVecEnv  # noqa: F401
