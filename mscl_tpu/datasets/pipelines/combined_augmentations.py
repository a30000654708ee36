"""MoCoTransform — torchvision-style paired random-resized-crop on stacked
frames (plain-MoCo configs).

Parity: reference mmaction/datasets/pipelines/combined_augmentations.py
:47-111 (RandomResizedCropVideo applied independently to the q and k
copies of the clip).
"""
from __future__ import annotations

import numpy as np

from ..builder import PIPELINES
from .augmentations import get_random_resized_crop_bbox, imresize


@PIPELINES.register_module()
class MoCoTransform:

    def __init__(self, size=112, area_range=(0.2, 1.0),
                 aspect_ratio_range=(3 / 4, 4 / 3)):
        self.size = (size, size) if isinstance(size, int) else tuple(size)
        self.area_range = tuple(area_range)
        self.aspect_ratio_range = tuple(aspect_ratio_range)

    def _one_view(self, imgs, img_shape):
        l, t, r, b = get_random_resized_crop_bbox(
            img_shape, self.area_range, self.aspect_ratio_range)
        return [imresize(img[t:b, l:r], self.size) for img in imgs]

    def __call__(self, results):
        imgs = results['imgs']
        img_shape = results['img_shape']
        results['imgs'] = [self._one_view(imgs, img_shape),
                           self._one_view(imgs, img_shape)]
        results['img_shape'] = (self.size[1], self.size[0])
        results['clip_len'] = len(imgs)
        results['num_clips'] = 2
        return results
