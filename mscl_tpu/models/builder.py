"""Model registries and build functions.

Parity: reference mmaction/models/builder.py:9-60 — one shared MODELS
registry exposed as BACKBONES/NECKS/HEADS/RECOGNIZERS/LOSSES/LOCALIZERS,
plus a separate SSL_AUGS registry.
"""
from __future__ import annotations

from ..registry import Registry, build_from_cfg

MODELS = Registry('models')
BACKBONES = MODELS
NECKS = MODELS
HEADS = MODELS
RECOGNIZERS = MODELS
LOSSES = MODELS
LOCALIZERS = MODELS
SSL_AUGS = Registry('ssl_augs')


def build_backbone(cfg):
    return BACKBONES.build(cfg)


def build_neck(cfg):
    return NECKS.build(cfg)


def build_head(cfg):
    return HEADS.build(cfg)


def build_loss(cfg):
    return LOSSES.build(cfg)


def build_recognizer(cfg, train_cfg=None, test_cfg=None):
    return RECOGNIZERS.build(
        cfg, default_args=dict(train_cfg=train_cfg, test_cfg=test_cfg))


def build_ssl_aug(cfg):
    return build_from_cfg(cfg, SSL_AUGS)


def build_model(cfg, train_cfg=None, test_cfg=None):
    """Build the top-level model (reference builder.py:52-60)."""
    args = cfg.copy()
    obj_type = args.get('type')
    if obj_type in RECOGNIZERS:
        return build_recognizer(cfg, train_cfg, test_cfg)
    raise KeyError(f'unknown model type: {obj_type}')
