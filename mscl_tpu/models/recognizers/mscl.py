"""MSCL / MSCLWithAug — the paper's composite model.

Parity: reference mmaction/models/recognizers/mscl.py —
  - MSCLWithAug.forward_train (:225-277): device aug -> RGB tower
    loss/features -> split concatenated flow into (base, FRA-rotated)
    along T (:230-238) -> flow tower on both (rotated pass with
    update_queue=update_aug_flow, losses suffixed '_aug' and weighted by
    weight_aug_flow[0], :239-245) -> cross-modal MoCo loss RGB<->flow
    using the other tower's decayed queue (:254-261) -> LMCL via sup_head
    with aux_keys feature routing (:263-269)
  - MSCL (:9-134): no FRA — single flow pass
"""
from __future__ import annotations

import os
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..builder import HEADS, RECOGNIZERS, build_ssl_aug
from .base import parse_losses
from .moco import _MoCoBase, MoCoV2, MoCo
from .recognizer3d import to_nthwc


def _build_sub_recognizer(cfg, dtype):
    cfg = dict(cfg)
    rec_type = cfg.pop('type')
    cfg.setdefault('dtype', dtype)
    cls = RECOGNIZERS.get(rec_type)
    assert cls is not None and issubclass(cls, _MoCoBase), rec_type
    return cls(**cfg)


def _build_head(cfg, dtype=None):
    cfg = dict(cfg)
    head_type = cfg.pop('type')
    cls = HEADS.get(head_type)
    if isinstance(cls, type) and issubclass(cls, nn.Module):
        return cls(dtype=dtype, **cfg) if dtype is not None else cls(**cfg)
    return cls(**cfg)


@RECOGNIZERS.register_module()
class MSCLWithAug(nn.Module):
    recognizer: Any = None
    recognizer_flow: Any = None
    moco_mx_head: Any = None
    sup_head: Any = None
    im_key: str = 'imgs'
    flow_key: Any = 'flow_imgs'
    aux_info: Any = ()
    aug: Any = None
    same_kn: bool = True
    update_aug_flow: bool = False
    weight_aug_flow: Tuple[float, float] = (1.0, 1.0)
    train_cfg: Any = None
    test_cfg: Any = None
    dtype: Any = jnp.float32
    # Run the base + FRA flow passes as ONE 2B-stacked tower forward
    # (halves flow-tower kernel launches; BN stats become joint over the
    # two passes — opt-in divergence, see PARITY.md and the A/B in
    # docs/benchmark.md).
    batch_flow_passes: bool = (
        os.environ.get('MSCL_FLOW_BATCHED', '0') == '1')

    def setup(self):
        self.recognizer_m = _build_sub_recognizer(self.recognizer,
                                                  self.dtype)
        self.recognizer_flow_m = _build_sub_recognizer(
            self.recognizer_flow, self.dtype)
        self.moco_mx_head_m = _build_head(self.moco_mx_head)
        self.sup_head_m = _build_head(self.sup_head, dtype=self.dtype)
        self.aug_gpu = build_ssl_aug(dict(self.aug or
                                          dict(type='IdentityAug')))
        if isinstance(self.flow_key, (list, tuple)):
            self.cat_flow = False
            self.flow_keys = tuple(self.flow_key)
        else:
            self.cat_flow = True
            self.flow_keys = (self.flow_key,)

    # ---------------------------------------------------------- forward
    def forward_train(self, im_q, im_k, aux_info, train: bool = True
                      ) -> Dict[str, jnp.ndarray]:
        im_q, im_k, aux_info = self.aug_gpu(self.make_rng('moco'),
                                            im_q, im_k, aux_info)
        loss_img, im_features = self.recognizer_m.forward_train(
            im_q, im_k, aux_info, return_features=True, train=train)

        fk = self.flow_keys[0]
        if self.cat_flow:
            cat_q = aux_info[f'{fk}_q']      # (B, 2T, H, W, C)
            cat_k = aux_info[f'{fk}_k']
            t = cat_q.shape[1] // 2
            flow_im_q, aug_flow_im_q = cat_q[:, :t], cat_q[:, t:]
            flow_im_k, aug_flow_im_k = cat_k[:, :t], cat_k[:, t:]
        else:
            flow_im_q = aux_info[f'{self.flow_keys[0]}_q']
            flow_im_k = aux_info[f'{self.flow_keys[0]}_k']
            aug_flow_im_q = aux_info[f'{self.flow_keys[1]}_q']
            aug_flow_im_k = aux_info[f'{self.flow_keys[1]}_k']

        if self.batch_flow_passes:
            (loss_base_flow, base_flow_features), \
                (loss_aug_flow, aug_flow_features) = \
                self.recognizer_flow_m.forward_train_pair(
                    flow_im_q, flow_im_k, aug_flow_im_q, aug_flow_im_k,
                    aux_info, update_queue_b=self.update_aug_flow,
                    train=train)
        else:
            loss_base_flow, base_flow_features = \
                self.recognizer_flow_m.forward_train(
                    flow_im_q, flow_im_k, aux_info, return_features=True,
                    train=train)
            loss_aug_flow, aug_flow_features = \
                self.recognizer_flow_m.forward_train(
                    aug_flow_im_q, aug_flow_im_k, aux_info,
                    return_features=True,
                    update_queue=self.update_aug_flow, train=train)
        loss_flow = dict(loss_base_flow)
        for k in loss_aug_flow:
            if k.startswith('loss'):
                assert k in loss_flow
                loss_flow[k + '_aug'] = (loss_aug_flow[k] *
                                         self.weight_aug_flow[0])

        weight = im_features['weight']
        weight_flow = base_flow_features['weight']

        q, key = im_features['q'], im_features['k']
        q_base_flow = base_flow_features['q']
        k_base_flow = base_flow_features['k']

        # cross-modal MoCo (reference mscl.py:254-261)
        rf_logits, fr_logits, ssl_label = \
            self.moco_mx_head_m.forward_moco_mx(
                q, key, q_base_flow, k_base_flow, weight, weight_flow)
        loss_mx = self.moco_mx_head_m.loss(rf_logits, fr_logits, ssl_label)
        if self.weight_aug_flow[1] > 0:
            q_aug_flow = aug_flow_features['q']
            k_aug_flow = aug_flow_features['k']
            a_rf, a_fr, a_lbl = self.moco_mx_head_m.forward_moco_mx(
                q, key, q_aug_flow, k_aug_flow, weight, weight_flow)
            loss_mx.update(self.moco_mx_head_m.loss(a_rf, a_fr, a_lbl,
                                                    suffix='_aug'))

        # LMCL (reference mscl.py:263-269)
        aux = dict(aux_info)
        aux = self.sup_head_m.update_aux_info('im_features', im_features,
                                              aux)
        aux = self.sup_head_m.update_aux_info('base_flow_features',
                                              base_flow_features, aux)
        aux = self.sup_head_m.update_aux_info('aug_flow_features',
                                              aug_flow_features, aux)
        aux_sup = self.sup_head_m(**aux)
        aux.update(aux_sup)
        loss_sup = self.sup_head_m.loss(**aux)

        losses: Dict[str, jnp.ndarray] = {}
        losses.update(loss_img)
        losses.update(loss_flow)
        losses.update(loss_mx)
        losses.update(loss_sup)
        return losses

    def __call__(self, im_q, im_k, aux_info=None, return_loss=True,
                 train: bool = True):
        if not return_loss:
            raise NotImplementedError('SSL recognizer has no test mode')
        return self.forward_train(im_q, im_k, dict(aux_info or {}),
                                  train=train)

    def train_step(self, batch, train: bool = True):
        """(reference mscl.py:192-212): pulls [q, k] pairs for imgs and
        each flow key from the batch, converts NCTHW -> NTHWC. Pixel
        tensors are cast to the model dtype up front so the whole device
        aug (flips, color wheel, jitter) runs at bf16 HBM traffic — the
        towers cast at their first conv anyway. Cast BEFORE the
        channels-last transpose: the transpose is a real layout copy, and
        moving it to bf16 halves its bytes."""
        cast = (lambda x: to_nthwc(x.astype(self.dtype)))
        im_q = cast(batch[self.im_key][0])
        im_k = cast(batch[self.im_key][1])
        aux_info = {}
        for fk in (self.flow_key if isinstance(self.flow_key, (list, tuple))
                   else (self.flow_key,)):
            aux_info[f'{fk}_q'] = cast(batch[fk][0])
            aux_info[f'{fk}_k'] = cast(batch[fk][1])
        for item in self.aux_info:
            aux_info[item] = batch[item]
        losses = self.forward_train(im_q, im_k, aux_info, train=train)
        loss, log_vars = parse_losses(losses)
        return loss, log_vars


@RECOGNIZERS.register_module()
class MSCL(MSCLWithAug):
    """MSCL without FRA (reference mscl.py:9-134): single flow pass, flow
    images under flow_img_key."""
    flow_img_key: str = 'flow_imgs'

    def forward_train(self, im_q, im_k, aux_info, train: bool = True):
        im_q, im_k, aux_info = self.aug_gpu(self.make_rng('moco'),
                                            im_q, im_k, aux_info)
        loss_img, im_features = self.recognizer_m.forward_train(
            im_q, im_k, aux_info, return_features=True, train=train)
        flow_im_q = aux_info[f'{self.flow_img_key}_q']
        flow_im_k = aux_info[f'{self.flow_img_key}_k']
        loss_flow, flow_features = self.recognizer_flow_m.forward_train(
            flow_im_q, flow_im_k, aux_info, return_features=True,
            train=train)

        weight = im_features['weight']
        weight_flow = flow_features['weight']
        q, key = im_features['q'], im_features['k']
        q_flow, k_flow = flow_features['q'], flow_features['k']

        rf_logits, fr_logits, ssl_label = \
            self.moco_mx_head_m.forward_moco_mx(
                q, key, q_flow, k_flow, weight, weight_flow)
        loss_mx = self.moco_mx_head_m.loss(rf_logits, fr_logits, ssl_label)

        aux = dict(aux_info)
        aux = self.sup_head_m.update_aux_info('im_features', im_features,
                                              aux)
        aux = self.sup_head_m.update_aux_info('base_flow_features',
                                              flow_features, aux)
        aux_sup = self.sup_head_m(**aux)
        aux.update(aux_sup)
        loss_sup = self.sup_head_m.loss(**aux)

        losses: Dict[str, jnp.ndarray] = {}
        losses.update(loss_img)
        losses.update(loss_flow)
        losses.update(loss_mx)
        losses.update(loss_sup)
        return losses


@RECOGNIZERS.register_module()
class MoDist(nn.Module):
    """Reimplemented MoDist ablation: RGB + flow towers with cross-modal
    InfoNCE only (reference mmaction/models/recognizers/modist.py:9-132)."""
    recognizer: Any = None
    recognizer_flow: Any = None
    moco_mx_head: Any = None
    im_key: str = 'imgs'
    flow_key: str = 'flow_imgs'
    aux_info: Any = ()
    aug: Any = None
    same_kn: bool = True
    train_cfg: Any = None
    test_cfg: Any = None
    dtype: Any = jnp.float32

    def setup(self):
        self.recognizer_m = _build_sub_recognizer(self.recognizer,
                                                  self.dtype)
        self.recognizer_flow_m = _build_sub_recognizer(
            self.recognizer_flow, self.dtype)
        self.moco_mx_head_m = _build_head(self.moco_mx_head)
        self.aug_gpu = build_ssl_aug(dict(self.aug or
                                          dict(type='IdentityAug')))

    def forward_train(self, im_q, im_k, aux_info, train: bool = True):
        im_q, im_k, aux_info = self.aug_gpu(self.make_rng('moco'),
                                            im_q, im_k, aux_info)
        loss_img, im_features = self.recognizer_m.forward_train(
            im_q, im_k, aux_info, return_features=True, train=train)
        flow_im_q = aux_info[f'{self.flow_key}_q']
        flow_im_k = aux_info[f'{self.flow_key}_k']
        loss_flow, flow_features = self.recognizer_flow_m.forward_train(
            flow_im_q, flow_im_k, aux_info, return_features=True,
            train=train)
        rf_logits, fr_logits, ssl_label = \
            self.moco_mx_head_m.forward_moco_mx(
                im_features['q'], im_features['k'], flow_features['q'],
                flow_features['k'], im_features['weight'],
                flow_features['weight'])
        losses = dict(loss_img)
        losses.update(loss_flow)
        losses.update(self.moco_mx_head_m.loss(rf_logits, fr_logits,
                                               ssl_label))
        return losses

    def train_step(self, batch, train: bool = True):
        im_q = to_nthwc(batch[self.im_key][0])
        im_k = to_nthwc(batch[self.im_key][1])
        aux_info = {f'{self.flow_key}_q': to_nthwc(batch[self.flow_key][0]),
                    f'{self.flow_key}_k': to_nthwc(batch[self.flow_key][1])}
        for item in self.aux_info:
            aux_info[item] = batch[item]
        losses = self.forward_train(im_q, im_k, aux_info, train=train)
        loss, log_vars = parse_losses(losses)
        return loss, log_vars
