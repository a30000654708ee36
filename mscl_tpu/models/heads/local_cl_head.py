"""MSCLWithAugPosHeadV2 — the LMCL (Local Motion Contrastive Learning)
head: frame-level temporal alignment of RGB vs flow features.

Parity: reference mmaction/models/heads/local_cl_head.py:10-81 —
RGB features q_mlvl[0] (b, c, t after spatial pooling) vs
concat(base-flow, rotated-flow) features (b, c, 2t); optional 1x1 conv
projections, L2 normalize over channels, sim = bmm(x_q^T, x_q_flow)
(b, t, 2t); CE with labels arange(t): frame i of RGB must match base-flow
frame i — the t rotated-flow columns are the FRA negatives.

Note the reference's registration gap: this head is referenced by the
mscl_r18 config but never imported by heads/__init__.py (SURVEY §2.1) —
registered properly here.

Flax module because trans_rgb/trans_flow may carry conv params (the
mscl_r18 config uses bkb_channels=(None, None) -> identity).
"""
from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..builder import HEADS, build_loss
from .base import topk_accuracy


@HEADS.register_module()
class MSCLWithAugPosHeadV2(nn.Module):
    basename: str = ''
    loss_cls: Any = None
    loss_pos: Any = None
    num_classes: int = 2
    in_channels: int = 128
    mlvl_ids: Tuple[int, int] = (0, -1)
    bkb_channels: Tuple = (512, 128)
    t: int = 8
    T: float = 0.07
    aux_keys: Any = None
    dtype: Any = jnp.float32

    def _loss_pos_fn(self):
        return build_loss(dict(self.loss_pos or
                               dict(type='CrossEntropyLoss')))

    @nn.compact
    def __call__(self, q_mlvl, q_flow_mlvl, q_aug_flow_mlvl, **kwargs
                 ) -> Dict[str, jnp.ndarray]:
        # features are NTHWC: (b, t, h, w, c)
        x_q = q_mlvl[self.mlvl_ids[0]]
        x_q_flow = jnp.concatenate(
            [q_flow_mlvl[self.mlvl_ids[1]],
             q_aug_flow_mlvl[self.mlvl_ids[1]]], axis=1)  # (b, 2t, h, w, c)

        x_q = x_q.mean(axis=(2, 3))          # (b, t, c)
        x_q_flow = x_q_flow.mean(axis=(2, 3))  # (b, 2t, c)

        if self.bkb_channels[0] is not None:
            x_q = nn.Dense(128, dtype=self.dtype, name='trans_rgb_0')(x_q)
            x_q = nn.relu(x_q)
            x_q = nn.Dense(128, dtype=self.dtype, name='trans_rgb_1')(x_q)
        if self.bkb_channels[1] is not None:
            x_q_flow = nn.Dense(128, dtype=self.dtype,
                                name='trans_flow')(x_q_flow)

        x_q = x_q / jnp.linalg.norm(x_q, axis=-1, keepdims=True).clip(1e-12)
        x_q_flow = x_q_flow / jnp.linalg.norm(
            x_q_flow, axis=-1, keepdims=True).clip(1e-12)
        sim = jnp.einsum('btc,bsc->bts', x_q, x_q_flow)  # (b, t, 2t)

        b, t = sim.shape[0], sim.shape[1]
        pos_scores = sim.reshape(b * t, -1) / self.T
        pos_labels = jnp.tile(jnp.arange(t, dtype=jnp.int32), (b,))
        return dict(pos_scores=pos_scores, pos_labels=pos_labels)

    def loss(self, pos_scores, pos_labels, **kwargs) -> Dict:
        losses = {
            'loss_pos': self._loss_pos_fn()(pos_scores, pos_labels),
            'top1_acc_pos': topk_accuracy(pos_scores, pos_labels, 1),
            'top5_acc_pos': topk_accuracy(pos_scores, pos_labels, 5),
        }
        return losses

    def update_aux_info(self, info_name, info_dict, target):
        """Route recognizer feature dicts into the aux-info namespace
        (reference local_cl_head.py:75-81)."""
        aux_keys = self.aux_keys or {}
        if info_name in aux_keys:
            for k in aux_keys[info_name]:
                new_key = aux_keys[info_name][k]
                assert new_key not in target, f'{new_key} already in target'
                target[new_key] = info_dict[k]
        return target
