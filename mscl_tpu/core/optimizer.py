"""Optimizer construction with torch-SGD semantics.

Parity: reference configs — SGD(momentum=0.9, weight_decay) + grad-clip
(optimizer_config grad_clip max_norm, reference apis/train.py:107-114).
Update order matches torch: clip grads -> add wd*param -> momentum trace
-> -lr. Parameter subtrees matching ``freeze_patterns`` get zero updates —
the TPU equivalent of requires_grad=False for the MoCo key encoders
(reference moco.py:107-114 copies q->k and sets requires_grad False; here
the k-tower is excluded from the optimizer and overwritten by the EMA in
the train step).
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Sequence

import jax
import optax


def _path_str(path) -> str:
    return '/'.join(getattr(k, 'key', str(k)) for k in path)


def make_freeze_mask(params, freeze_patterns: Sequence[str]):
    """True = trainable. A leaf is frozen if any pattern appears in its
    '/'-joined path."""
    def trainable(path, _):
        p = _path_str(path)
        return not any(pat in p for pat in freeze_patterns)
    return jax.tree_util.tree_map_with_path(trainable, params)


def _tsm_label(path_str: str, fc_lr5: bool) -> str:
    """Parameter-group label per TSMOptimizerConstructor (reference
    core/optimizer/tsm_optimizer_constructor.py:22-110):
    BN params -> zero wd; biases -> 2x lr, zero wd; the cls_head fc gets
    5x lr (weight) / 10x lr + zero wd (bias) when fc_lr5."""
    p = path_str.lower()
    is_bias = p.endswith('bias')
    if '/bn' in p or 'batchnorm' in p or ('norm' in p and
                                          p.endswith('scale')):
        return 'bn'
    if 'fc_cls' in p and fc_lr5:
        return 'fc_b10' if is_bias else 'fc_w5'
    return 'bias2' if is_bias else 'default'


def _sgd_group(lr_schedule, lr_mult, wd, momentum, nesterov):
    chain = []
    if wd:
        chain.append(optax.add_decayed_weights(wd))
    if momentum:
        chain.append(optax.trace(decay=momentum, nesterov=nesterov))
    chain.append(optax.scale_by_learning_rate(
        lambda s: lr_mult * lr_schedule(s)))
    return optax.chain(*chain)


def build_tsm_optimizer(optimizer_cfg: Dict, lr_schedule: Callable,
                        grad_clip: Optional[Dict] = None,
                        paramwise_cfg: Optional[Dict] = None):
    """TSMOptimizerConstructor semantics over optax.multi_transform."""
    cfg = dict(optimizer_cfg)
    cfg.pop('type', None)
    cfg.pop('constructor', None)
    pw = dict(paramwise_cfg or cfg.pop('paramwise_cfg', {}) or {})
    fc_lr5 = bool(pw.get('fc_lr5', False))
    wd = cfg.pop('weight_decay', 0.0)
    momentum = cfg.pop('momentum', 0.0)
    nesterov = cfg.pop('nesterov', False)
    groups = {
        'default': _sgd_group(lr_schedule, 1.0, wd, momentum, nesterov),
        'bias2': _sgd_group(lr_schedule, 2.0, 0.0, momentum, nesterov),
        'bn': _sgd_group(lr_schedule, 1.0, 0.0, momentum, nesterov),
        'fc_w5': _sgd_group(lr_schedule, 5.0, wd, momentum, nesterov),
        'fc_b10': _sgd_group(lr_schedule, 10.0, 0.0, momentum,
                             nesterov),
    }

    def label_fn(params):
        return jax.tree_util.tree_map_with_path(
            lambda path, _: _tsm_label(_path_str(path), fc_lr5), params)

    chain = []
    if grad_clip:
        chain.append(optax.clip_by_global_norm(grad_clip['max_norm']))
    chain.append(optax.multi_transform(groups, label_fn))
    return optax.chain(*chain)


def build_optimizer(optimizer_cfg: Dict,
                    lr_schedule: Callable,
                    grad_clip: Optional[Dict] = None,
                    freeze_patterns: Sequence[str] = ()):
    """Returns an optax GradientTransformation.

    optimizer_cfg: dict(type='SGD', lr=..., momentum=..., weight_decay=...)
    grad_clip: dict(max_norm=..., norm_type=2) or None
    paramwise_cfg.custom_keys (mmcv DefaultOptimizerConstructor
    semantics, used by the reference timesformer/TIN configs): each
    parameter takes the lr_mult/decay_mult of its LONGEST matching key;
    dotted keys match '/'-joined flax paths.
    """
    cfg = dict(optimizer_cfg)
    if cfg.get('constructor') == 'TSMOptimizerConstructor':
        return build_tsm_optimizer(cfg, lr_schedule, grad_clip)
    cfg.pop('constructor', None)
    pw = dict(cfg.pop('paramwise_cfg', {}) or {})
    custom_keys = {k.replace('.', '/').strip('/'): dict(v)
                   for k, v in (pw.get('custom_keys') or {}).items()}
    opt_type = cfg.pop('type', 'SGD')
    cfg.pop('lr', None)  # schedule supplies lr
    wd = cfg.pop('weight_decay', 0.0)
    if opt_type in ('SGD', 'CopyOfSGD'):
        momentum = cfg.pop('momentum', 0.0)
        nesterov = cfg.pop('nesterov', False)

        def make_group(lr_mult=1.0, decay_mult=1.0):
            return _sgd_group(lr_schedule, lr_mult, wd * decay_mult,
                              momentum, nesterov)
    elif opt_type in ('Adam', 'AdamW'):
        betas = cfg.pop('betas', (0.9, 0.999))
        eps = cfg.pop('eps', 1e-8)

        def make_group(lr_mult=1.0, decay_mult=1.0):
            chain = [optax.scale_by_adam(b1=betas[0], b2=betas[1],
                                         eps=eps)]
            if wd * decay_mult:
                chain.append(optax.add_decayed_weights(wd * decay_mult))
            chain.append(optax.scale_by_learning_rate(
                lambda s: lr_mult * lr_schedule(s)))
            return optax.chain(*chain)
    else:
        raise NotImplementedError(f'optimizer {opt_type}')

    groups = {'default': make_group()}
    for i, v in enumerate(custom_keys.values()):
        groups[f'ck{i}'] = make_group(v.get('lr_mult', 1.0),
                                      v.get('decay_mult', 1.0))
    by_len = sorted(enumerate(custom_keys), key=lambda iv: -len(iv[1]))

    def group_of(path_str: str) -> str:
        if any(pat in path_str for pat in freeze_patterns):
            return 'frozen'
        for i, key in by_len:
            if key in path_str:
                return f'ck{i}'
        return 'default'

    if custom_keys or freeze_patterns:
        groups['frozen'] = optax.set_to_zero()

        def label_fn(params):
            return jax.tree_util.tree_map_with_path(
                lambda path, _: group_of(_path_str(path)), params)
        tx = optax.multi_transform(groups, label_fn)
    else:
        tx = groups['default']
    if grad_clip:
        assert grad_clip.get('norm_type', 2) == 2, 'only L2 clip supported'
        tx = optax.chain(
            optax.clip_by_global_norm(grad_clip['max_norm']), tx)
    return tx
