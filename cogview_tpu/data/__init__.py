from .datasets import BinaryDataset, IndexedDataset, get_dataset_by_type
from .templates import Code2CodeTemplate, PureTextTemplate, TextCodeTemplate
from .loader import DataConfig, make_loaders, detect_new_datasets

__all__ = [
    "BinaryDataset",
    "IndexedDataset",
    "get_dataset_by_type",
    "TextCodeTemplate",
    "Code2CodeTemplate",
    "PureTextTemplate",
    "DataConfig",
    "make_loaders",
    "detect_new_datasets",
]
