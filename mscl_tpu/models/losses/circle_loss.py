"""Multi-positive contrastive losses (MSF/circle-loss family).

Parity: reference mmaction/models/losses/circle_loss.py:13-120 —
softplus(LSE(sn) - LSE(sp)) and margin/scale variants; sp/sn may carry a
group dim (b, g, n) flattened before the LSE.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..builder import LOSSES


def _flatten_groups(sp, sn):
    num_group = 1
    if sp.ndim == 3:
        num_group = sp.shape[1]
        sp = sp.reshape(-1, sp.shape[-1])
        sn = sn.reshape(-1, sn.shape[-1])
    return sp, sn, num_group


@LOSSES.register_module()
class MultiPositiveSumLoss:

    def __init__(self, loss_weight=1.0, avg_on_group=True):
        self.loss_weight = loss_weight
        self.avg_on_group = avg_on_group

    def __call__(self, sp, sn, **kwargs):
        sp, sn, num_group = _flatten_groups(sp, sn)
        loss = jax.nn.softplus(
            jax.scipy.special.logsumexp(sn, axis=1) -
            jax.scipy.special.logsumexp(sp, axis=1)).mean()
        if not self.avg_on_group:
            loss = loss * num_group
        return self.loss_weight * loss


@LOSSES.register_module()
class MultiPositiveUniLoss:

    def __init__(self, m=0, gamma=1, loss_weight=1.0, avg_on_group=True):
        self.m = m
        self.gamma = gamma
        self.loss_weight = loss_weight
        self.avg_on_group = avg_on_group

    def __call__(self, sp, sn, **kwargs):
        sp, sn, num_group = _flatten_groups(sp, sn)
        logit_p = -sp * self.gamma
        logit_n = (sn + self.m) * self.gamma
        loss = jax.nn.softplus(
            jax.scipy.special.logsumexp(logit_n, axis=1) +
            jax.scipy.special.logsumexp(logit_p, axis=1)).mean()
        if not self.avg_on_group:
            loss = loss * num_group
        return self.loss_weight * loss


@LOSSES.register_module()
class MultiPositiveCircleLoss:

    def __init__(self, m=0.25, gamma=128, loss_weight=1.0,
                 avg_on_group=True):
        self.m = m
        self.gamma = gamma
        self.loss_weight = loss_weight
        self.avg_on_group = avg_on_group

    def __call__(self, sp, sn, **kwargs):
        sp, sn, num_group = _flatten_groups(sp, sn)
        ap = jnp.clip(-jax.lax.stop_gradient(sp) + 1 + self.m, 0.0, None)
        an = jnp.clip(jax.lax.stop_gradient(sn) + self.m, 0.0, None)
        delta_p = 1 - self.m
        delta_n = self.m
        logit_p = -ap * (sp - delta_p) * self.gamma
        logit_n = an * (sn - delta_n) * self.gamma
        loss = jax.nn.softplus(
            jax.scipy.special.logsumexp(logit_n, axis=1) +
            jax.scipy.special.logsumexp(logit_p, axis=1)).mean()
        if not self.avg_on_group:
            loss = loss * num_group
        return self.loss_weight * loss
