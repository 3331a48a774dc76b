from .datasets import ArrayDataset, DataLoader, VisionTactileDataset, load_pickle_dataset  # noqa: F401
from .task_datasets import make_task_dataset, bin_labels, LABEL_KEYS  # noqa: F401
