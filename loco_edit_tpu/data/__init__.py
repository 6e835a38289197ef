from loco_edit_tpu.data.datasets import (
    ImageFolderDataset,
    HFImageDataset,
    get_dataset,
)

__all__ = ["ImageFolderDataset", "HFImageDataset", "get_dataset"]
