"""Batch blending: MixUp / CutMix (parity: mmaction
datasets/blending_utils.py). Operates on device batches inside the train
step when train_cfg.blending is set."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .builder import BLENDINGS


class BaseMiniBatchBlending:

    def __init__(self, num_classes):
        self.num_classes = num_classes

    def __call__(self, rng, imgs, labels):
        one_hot = jax.nn.one_hot(labels, self.num_classes)
        return self.do_blending(rng, imgs, one_hot)


@BLENDINGS.register_module()
class MixupBlending(BaseMiniBatchBlending):

    def __init__(self, num_classes, alpha=0.2):
        super().__init__(num_classes)
        self.alpha = alpha

    def do_blending(self, rng, imgs, label):
        k1, k2 = jax.random.split(rng)
        lam = jax.random.beta(k1, self.alpha, self.alpha)
        perm = jax.random.permutation(k2, imgs.shape[0])
        mixed = lam * imgs + (1 - lam) * imgs[perm]
        mixed_label = lam * label + (1 - lam) * label[perm]
        return mixed, mixed_label


@BLENDINGS.register_module()
class CutmixBlending(BaseMiniBatchBlending):

    def __init__(self, num_classes, alpha=0.2):
        super().__init__(num_classes)
        self.alpha = alpha

    def do_blending(self, rng, imgs, label):
        k1, k2, k3, k4 = jax.random.split(rng, 4)
        lam = jax.random.beta(k1, self.alpha, self.alpha)
        perm = jax.random.permutation(k2, imgs.shape[0])
        h, w = imgs.shape[-3], imgs.shape[-2]  # NTHWC
        cut_rat = jnp.sqrt(1.0 - lam)
        cut_h = (h * cut_rat).astype(jnp.int32)
        cut_w = (w * cut_rat).astype(jnp.int32)
        cy = jax.random.randint(k3, (), 0, h)
        cx = jax.random.randint(k4, (), 0, w)
        y1 = jnp.clip(cy - cut_h // 2, 0, h)
        y2 = jnp.clip(cy + cut_h // 2, 0, h)
        x1 = jnp.clip(cx - cut_w // 2, 0, w)
        x2 = jnp.clip(cx + cut_w // 2, 0, w)
        ys = jnp.arange(h)[:, None]
        xs = jnp.arange(w)[None, :]
        mask = ((ys >= y1) & (ys < y2) & (xs >= x1) & (xs < x2))
        mask = mask[None, None, :, :, None]
        mixed = jnp.where(mask, imgs[perm], imgs)
        lam_adj = 1.0 - ((y2 - y1) * (x2 - x1)) / (h * w)
        mixed_label = lam_adj * label + (1 - lam_adj) * label[perm]
        return mixed, mixed_label
