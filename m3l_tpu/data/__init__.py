from .datasets import ArrayDataset, DataLoader, VisionTactileDataset, load_pickle_dataset  # noqa: F401
