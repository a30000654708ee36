"""MoCoTransform — torchvision-style paired random-resized-crop producing
[q, k] CTHW clips (plain-MoCo configs).

Parity: reference mmaction/datasets/pipelines/combined_augmentations.py
:47-111 — config signature (transform/crop_transform/ending_transform)
mirrors the torchvision-video compose the reference builds: each view is
an independent RandomResizedCropVideo then ToTensorVideo (stack frames,
/255, HWC->CTHW).
"""
from __future__ import annotations

import numpy as np

from ..builder import PIPELINES
from .augmentations import get_random_resized_crop_bbox, imresize


@PIPELINES.register_module()
class MoCoTransform:

    def __init__(self, transform=(), crop_transform=None,
                 ending_transform=(), size=112, scale=(0.2, 1.0),
                 aspect_ratio_range=(3 / 4, 4 / 3)):
        crop_transform = crop_transform or {}
        size = crop_transform.get('size', size)
        scale = crop_transform.get('scale', scale)
        if isinstance(size, int):
            size = (size, size)
        self.size = tuple(size)
        self.area_range = tuple(float(s) for s in scale)
        self.aspect_ratio_range = tuple(aspect_ratio_range)
        # transform/ending_transform accepted for reference-config parity;
        # ToTensorVideo (stack + /255 + CTHW) is always applied

    def _one_view(self, imgs, img_shape):
        l, t, r, b = get_random_resized_crop_bbox(
            img_shape, self.area_range, self.aspect_ratio_range)
        cropped = [imresize(img[t:b, l:r], self.size) for img in imgs]
        clip = np.stack(cropped).astype(np.float32) / 255.0
        return clip.transpose(3, 0, 1, 2)  # THWC -> CTHW

    def __call__(self, results):
        imgs = results['imgs']
        img_shape = results['img_shape']
        results['imgs'] = [self._one_view(imgs, img_shape),
                           self._one_view(imgs, img_shape)]
        results['img_shape'] = (self.size[1], self.size[0])
        return results
