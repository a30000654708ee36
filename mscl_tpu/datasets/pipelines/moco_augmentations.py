"""MoCo paired-view crops/resize/normalize.

Parity targets (reference mmaction/datasets/pipelines/moco_augmentations.py):
  - MoCoRandomResizedCrop  :11-211  two independent crops (_q/_k) applied
    jointly to imgs and flow (flow bbox scaled by flow/img resolution ratio)
  - MoCoResize             :214-360 suffix-aware resize; the '_k' pass merges
    imgs = [imgs_q, imgs_k]
  - MoCoNormalize(/V2)     :363-423 /255 and HWC->CTHW per branch

Output layout note: MoCoNormalize keeps the reference's CTHW output for
config-compatibility; the loader/model adapter transposes the batch to the
TPU-native NTHWC before device put.
"""
from __future__ import annotations

import numpy as np

from ..builder import PIPELINES
from .augmentations import (_all_box_crop, _box_resize, _crop_imgs,
                            _update_crop_quadruple,
                            get_random_resized_crop_bbox, imresize,
                            rescale_size)


@PIPELINES.register_module()
class MoCoRandomResizedCrop:
    """Two independent random resized crops over the q/k halves of the frame
    list; crops replayed onto the flow frames at flow resolution."""

    def __init__(self, area_range=(0.08, 1.0),
                 aspect_ratio_range=(3 / 4, 4 / 3), lazy=False,
                 flow_key=None):
        assert not lazy
        self.area_range = tuple(area_range)
        self.aspect_ratio_range = tuple(aspect_ratio_range)
        self.flow_key = flow_key

    def single_cal(self, imgs, results, flows=None, suffix='_q'):
        img_h, img_w = results['img_shape']
        left, top, right, bottom = get_random_resized_crop_bbox(
            (img_h, img_w), self.area_range, self.aspect_ratio_range)
        new_h, new_w = bottom - top, right - left

        if 'crop_quadruple' in results:
            results['crop_quadruple' + suffix] = results['crop_quadruple']
        _update_crop_quadruple(results, left, top, new_w, new_h,
                               img_w, img_h, key='crop_quadruple' + suffix)

        crop_bbox = np.array([left, top, right, bottom])
        results['crop_bbox' + suffix] = crop_bbox
        results['img_shape' + suffix] = (new_h, new_w)
        results['imgs' + suffix] = _crop_imgs(imgs, crop_bbox)

        if 'gt_bboxes' in results:
            boxed = dict(gt_bboxes=results['gt_bboxes'])
            if 'proposals' in results:
                boxed['proposals'] = results['proposals']
            boxed = _all_box_crop(boxed, crop_bbox)
            results['gt_bboxes' + suffix] = boxed['gt_bboxes']
            if 'proposals' in boxed:
                results['proposals' + suffix] = boxed['proposals']

        if flows is not None:
            # replay the crop at the flow resolution (reference
            # moco_augmentations.py:152-162)
            if 'flow_im_rate' in results:
                h_rate, w_rate = results['flow_im_rate']
            else:
                flow_h, flow_w = flows[0].shape[0], flows[0].shape[1]
                h_rate, w_rate = flow_h / img_h, flow_w / img_w
            crop_bbox_flow = np.array([
                int(round(left * w_rate)), int(round(top * h_rate)),
                int(round(right * w_rate)), int(round(bottom * h_rate))])
            results[self.flow_key + suffix] = _crop_imgs(flows,
                                                         crop_bbox_flow)
        return results

    def __call__(self, results):
        clip_len = results['clip_len']
        imgs = results['imgs']
        imgs_len = len(imgs)
        # q/k split: when the sampler emitted 2 clips the list holds both
        if clip_len == imgs_len:
            imgs_q, imgs_k = imgs, imgs
        else:
            imgs_q, imgs_k = imgs[:imgs_len // 2], imgs[imgs_len // 2:]
        flows_q = flows_k = None
        if self.flow_key:
            flows = results[self.flow_key]
            if clip_len == imgs_len:
                flows_q, flows_k = flows, flows
            else:
                flows_len = len(flows)
                flows_q = flows[:flows_len // 2]
                flows_k = flows[flows_len // 2:]
        results = self.single_cal(imgs_q, results, flows_q, suffix='_q')
        results = self.single_cal(imgs_k, results, flows_k, suffix='_k')
        results['img_shape'] = results['img_shape_q']
        del results['imgs']
        if self.flow_key:
            del results[self.flow_key]
        if 'gt_bboxes' in results:
            del results['gt_bboxes']
            results.pop('proposals', None)
        return results

    def __repr__(self):
        return (f'{self.__class__.__name__}(area_range={self.area_range}, '
                f'aspect_ratio_range={self.aspect_ratio_range})')


@PIPELINES.register_module()
class MoCoResize:
    """Suffix-aware resize; on the '_k' pass merges the q/k branches into
    paired lists (reference moco_augmentations.py:214-360)."""

    def __init__(self, scale, keep_ratio=False, interpolation='bilinear',
                 lazy=False, suffix='', flow_key='flow_imgs'):
        assert not lazy
        if isinstance(scale, float):
            if scale <= 0:
                raise ValueError(f'Invalid scale {scale}')
        elif isinstance(scale, (tuple, list)):
            scale = tuple(scale)
            max_long_edge = max(scale)
            max_short_edge = min(scale)
            if max_short_edge == -1:
                scale = (np.inf, max_long_edge)
        else:
            raise TypeError(f'Scale must be float or tuple, got {type(scale)}')
        self.scale = scale
        self.keep_ratio = keep_ratio
        self.interpolation = interpolation
        self.suffix = suffix
        self.flow_key = flow_key

    def _fn(self, name):
        return name + self.suffix

    def _resize_imgs(self, imgs, new_w, new_h):
        return [imresize(img, (new_w, new_h), self.interpolation)
                for img in imgs]

    def __call__(self, results):
        if self._fn('scale_factor') not in results:
            results[self._fn('scale_factor')] = np.array([1, 1],
                                                         dtype=np.float32)
        img_h, img_w = results[self._fn('img_shape')]
        if self.keep_ratio:
            new_w, new_h = rescale_size((img_w, img_h), self.scale)
        else:
            new_w, new_h = self.scale
        scale_factor = np.array([new_w / img_w, new_h / img_h],
                                dtype=np.float32)
        results[self._fn('img_shape')] = (new_h, new_w)
        results[self._fn('keep_ratio')] = self.keep_ratio
        results[self._fn('scale_factor')] = (
            results[self._fn('scale_factor')] * scale_factor)
        if self._fn('imgs') in results:
            results[self._fn('imgs')] = self._resize_imgs(
                results[self._fn('imgs')], new_w, new_h)
        if self.flow_key:
            results[self._fn(self.flow_key)] = self._resize_imgs(
                results[self._fn(self.flow_key)], new_w, new_h)
        if self._fn('gt_bboxes') in results:
            results[self._fn('gt_bboxes')] = _box_resize(
                results[self._fn('gt_bboxes')], scale_factor)
            if self._fn('proposals') in results and \
                    results[self._fn('proposals')] is not None:
                results[self._fn('proposals')] = _box_resize(
                    results[self._fn('proposals')], scale_factor)
        # merge the two branches after the second (_k) pass
        if self.suffix == '_k':
            results['imgs'] = [results['imgs_q'], results['imgs_k']]
            if self.flow_key:
                results[self.flow_key] = [results[self.flow_key + '_q'],
                                          results[self.flow_key + '_k']]
            results['img_shape'] = results['img_shape_q']
        return results

    def __repr__(self):
        return (f'{self.__class__.__name__}(scale={self.scale}, '
                f'suffix={self.suffix!r})')


@PIPELINES.register_module()
class MoCoNormalize:
    """/255 + HWC->CTHW for both branches of imgs and flow_imgs
    (reference moco_augmentations.py:363-393). ``ori_flow=True`` skips /255
    for already-normalized flow."""

    def __init__(self, ori_flow=False):
        self.ori_flow = ori_flow

    def __call__(self, results):
        for idx in range(2):
            # one fused uint8->f32 divide (bit-identical to
            # astype(f32)/255.0, two fewer full-tensor copies)
            imgs = np.divide(np.stack(results['imgs'][idx]), 255.0,
                             dtype=np.float32)
            results['imgs'][idx] = imgs.transpose((3, 0, 1, 2))
            if 'flow_imgs' in results:
                flows = np.stack(results['flow_imgs'][idx])
                if not self.ori_flow:
                    flows = np.divide(flows, 255.0, dtype=np.float32)
                elif flows.dtype != np.float32:
                    flows = flows.astype(np.float32)
                results['flow_imgs'][idx] = flows.transpose((3, 0, 1, 2))
        return results

    def __repr__(self):
        return f'{self.__class__.__name__}(ori_flow={self.ori_flow})'


@PIPELINES.register_module()
class MoCoNormalizeV2(MoCoNormalize):
    """V1 + CTHW transpose for raw 'flows'
    (reference moco_augmentations.py:396-423)."""

    def __call__(self, results):
        results = super().__call__(results)
        if 'flows' in results:
            for idx in range(2):
                flows = np.stack(results['flows'][idx])
                if flows.dtype != np.float32:
                    flows = flows.astype(np.float32)
                results['flows'][idx] = flows.transpose((3, 0, 1, 2))
        return results
