from nvit_tpu.data.augment import normalize, preprocess
from nvit_tpu.data.datasets import (
    ArrayDataset,
    ImageFolderDataset,
    load_cifar,
    load_dataset,
    load_imagenet,
    make_synthetic,
)
from nvit_tpu.data.pipeline import device_prefetch, make_epoch_iterator

__all__ = [
    "normalize",
    "preprocess",
    "ArrayDataset",
    "ImageFolderDataset",
    "load_cifar",
    "load_dataset",
    "load_imagenet",
    "make_synthetic",
    "device_prefetch",
    "make_epoch_iterator",
]
