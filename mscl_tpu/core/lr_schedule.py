"""LR schedules with mmcv LrUpdaterHook semantics.

Parity: reference configs use
  - dict(policy='step', step=[14, 18])                 (test_ssv2_r18.py:114)
  - dict(policy='CosineAnnealing', min_lr=0,
         warmup_iters=5, warmup_by_epoch=True)         (mscl_r18:123)
mmcv semantics reproduced: by_epoch policies use the epoch index as
progress; warmup (when the 'warmup' key is set) scales lr over the first
warmup_iters iterations (converted from epochs when warmup_by_epoch).
Returned schedules are step -> lr functions usable with optax.
"""
from __future__ import annotations

import math
from typing import Callable, Dict

import jax.numpy as jnp


def build_lr_schedule(lr_config: Dict, base_lr: float, total_epochs: int,
                      steps_per_epoch: int) -> Callable:
    cfg = dict(lr_config or {})
    policy = cfg.pop('policy', 'fixed')
    by_epoch = cfg.pop('by_epoch', True)
    warmup = cfg.pop('warmup', None)
    warmup_iters = cfg.pop('warmup_iters', 0)
    warmup_ratio = cfg.pop('warmup_ratio', 0.1)
    warmup_by_epoch = cfg.pop('warmup_by_epoch', False)
    if warmup_by_epoch:
        warmup_iters = warmup_iters * steps_per_epoch

    if policy == 'fixed':
        def regular(step):
            return jnp.asarray(base_lr)
    elif policy == 'step':
        steps = cfg.get('step')
        gamma = cfg.get('gamma', 0.1)
        if isinstance(steps, int):
            steps = [steps]
        steps_arr = jnp.asarray(steps)

        def regular(step):
            progress = step // steps_per_epoch if by_epoch else step
            exp = jnp.sum(progress >= steps_arr)
            return base_lr * (gamma ** exp)
    elif policy == 'CosineAnnealing':
        min_lr = cfg.get('min_lr', 0.0)
        min_lr_ratio = cfg.get('min_lr_ratio', None)
        if min_lr_ratio is not None:
            min_lr = base_lr * min_lr_ratio
        max_progress = total_epochs if by_epoch else \
            total_epochs * steps_per_epoch

        def regular(step):
            progress = step / steps_per_epoch if by_epoch else step
            frac = jnp.clip(progress / max_progress, 0.0, 1.0)
            return min_lr + (base_lr - min_lr) * 0.5 * (
                jnp.cos(jnp.pi * frac) + 1.0)
    elif policy == 'TIN':
        # TINLrUpdaterHook (reference core/scheduler/lr_updater.py:6-40):
        # cosine annealing to min_lr with warmup iters subtracted from
        # the progress, and the TIN-repo linear warmup form
        # k = frac*(1-ratio) + ratio (multiplicative ramp-up from ratio)
        min_lr = cfg.get('min_lr', 0.0)
        max_progress = (total_epochs if by_epoch else
                        total_epochs * steps_per_epoch)

        def regular(step):
            progress = step / steps_per_epoch if by_epoch else step
            if warmup is not None:
                w_prog = warmup_iters / steps_per_epoch if by_epoch \
                    else warmup_iters
                frac = jnp.clip((progress - w_prog) /
                                jnp.maximum(max_progress - w_prog, 1e-8),
                                0.0, 1.0)
            else:
                frac = jnp.clip(progress / max_progress, 0.0, 1.0)
            return min_lr + (base_lr - min_lr) * 0.5 * (
                jnp.cos(jnp.pi * frac) + 1.0)

        if warmup == 'linear':
            def tin_warmup(step):
                reg = regular(step)
                frac = jnp.clip(step / max(warmup_iters, 1), 0.0, 1.0)
                k = frac * (1 - warmup_ratio) + warmup_ratio
                return jnp.where(step < warmup_iters, reg * k, reg)
            return tin_warmup
    else:
        raise NotImplementedError(f'lr policy {policy}')

    if warmup is None or warmup_iters == 0:
        return regular

    def with_warmup(step):
        reg = regular(step)
        frac = jnp.clip(step / max(warmup_iters, 1), 0.0, 1.0)
        if warmup == 'linear':
            k = (1 - frac) * (1 - warmup_ratio)
            warm = reg * (1 - k)
        elif warmup == 'constant':
            warm = reg * warmup_ratio
        elif warmup == 'exp':
            warm = reg * (warmup_ratio ** (1 - frac))
        else:
            raise NotImplementedError(f'warmup {warmup}')
        return jnp.where(step < warmup_iters, warm, reg)

    return with_warmup
