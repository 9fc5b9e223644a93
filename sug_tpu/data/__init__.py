from sug_tpu.data.datasets import (
    PointCloudDataset,
    load_dataset_full,
    create_single_dataset,
    create_splitted_dataset,
    make_synthetic_pointda,
    resolve_data_root,
    DATASET_LIST,
)
from sug_tpu.data.sampler import BatchIterator, ClassBalancedBatchIterator, paired_epoch
from sug_tpu.data.splitter import split_dataset

__all__ = [
    "PointCloudDataset",
    "load_dataset_full",
    "create_single_dataset",
    "create_splitted_dataset",
    "make_synthetic_pointda",
    "resolve_data_root",
    "DATASET_LIST",
    "BatchIterator",
    "ClassBalancedBatchIterator",
    "paired_epoch",
    "split_dataset",
]
