from loco_edit_tpu.masks.celeba import CelebAMaskDataset, CELEBA_SEMANTICS

__all__ = ["CelebAMaskDataset", "CELEBA_SEMANTICS"]
