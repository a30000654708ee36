"""MM2 recognition heads: TSN / TSM / SlowFast / X3D / TPN.

Parity: reference mmaction/models/heads/{tsn,tsm,slowfast,x3d,tpn}_head.py
— spatial pooling + dropout + fc, with segment consensus handled by the
recognizer (Recognizer2D averages segment scores; TSM averages after the
head per is_shift semantics).
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..builder import HEADS
from .base import BaseHead


class _PoolFCHead(BaseHead):
    num_classes: int = 400
    in_channels: int = 2048
    loss_cls: Any = None
    dropout_ratio: float = 0.4
    init_std: float = 0.01
    spatial_type: str = 'avg'
    multi_class: bool = False
    label_smooth_eps: float = 0.0
    # accepted for reference-config parity (tsn_head.py consensus=
    # dict(type='AvgConsensus', dim=1)); averaging is what _pool +
    # the num_segs consensus below already implement.
    consensus: Any = None
    temporal_pool: bool = False
    dtype: Any = jnp.float32

    def _pool(self, x):
        if x.ndim == 5:      # NTHWC
            return x.mean(axis=(1, 2, 3))
        if x.ndim == 4:      # NHWC
            return x.mean(axis=(1, 2))
        return x

    @nn.compact
    def __call__(self, x, train: bool = False, num_segs: int = 1):
        x = self._pool(x)
        if self.dropout_ratio:
            x = nn.Dropout(rate=self.dropout_ratio,
                           deterministic=not train)(x)
        score = nn.Dense(
            self.num_classes,
            kernel_init=nn.initializers.normal(stddev=self.init_std),
            dtype=self.dtype, name='fc_cls')(x)
        if num_segs > 1:
            # segment consensus: average scores over segments
            score = score.reshape((-1, num_segs) +
                                  score.shape[1:]).mean(axis=1)
        return score


@HEADS.register_module()
class TSNHead(_PoolFCHead):
    """reference tsn_head.py (avg consensus)."""
    dropout_ratio: float = 0.4
    init_std: float = 0.01


@HEADS.register_module()
class TSMHead(_PoolFCHead):
    """reference tsm_head.py (consensus over shifted segments; with
    temporal_pool the backbone halved the segment count)."""
    num_segments: int = 8
    dropout_ratio: float = 0.8
    init_std: float = 0.001
    is_shift: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False, num_segs: int = None):
        num_segs = num_segs or self.num_segments
        if self.is_shift and self.temporal_pool:
            num_segs = num_segs // 2
        return super().__call__(x, train=train, num_segs=num_segs)


@HEADS.register_module()
class TPNHead(_PoolFCHead):
    """reference tpn_head (TSN-style on the fused pyramid)."""
    dropout_ratio: float = 0.5


@HEADS.register_module()
class AudioTSNHead(_PoolFCHead):
    """reference audio_tsn_head.py:10-81: spatial-pool + dropout + fc
    over (N, T', F', C) spectrogram features."""
    dropout_ratio: float = 0.4
    init_std: float = 0.01


@HEADS.register_module()
class TimeSformerHead(BaseHead):
    """reference timesformer_head.py: fc over the cls token."""
    num_classes: int = 400
    in_channels: int = 768
    loss_cls: Any = None
    init_std: float = 0.02
    dropout_ratio: float = 0.0
    multi_class: bool = False
    label_smooth_eps: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, num_segs: int = 1):
        if x.ndim > 2:
            x = x.mean(axis=tuple(range(1, x.ndim - 1)))
        if self.dropout_ratio:
            x = nn.Dropout(rate=self.dropout_ratio,
                           deterministic=not train)(x)
        return nn.Dense(self.num_classes,
                        kernel_init=nn.initializers.truncated_normal(
                            self.init_std),
                        dtype=self.dtype, name='fc_cls')(x)


@HEADS.register_module()
class X3DHead(BaseHead):
    """reference x3d_head.py: pooled conv5 -> fc1 -> relu -> fc2."""
    num_classes: int = 400
    in_channels: int = 432
    mid_channels: int = 2048
    spatial_type: str = 'avg'   # reference cfg surface; 'avg' pooling
    loss_cls: Any = None
    dropout_ratio: float = 0.5
    init_std: float = 0.01
    fc1_bias: bool = False
    multi_class: bool = False
    label_smooth_eps: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, num_segs: int = 1):
        if x.ndim == 5:
            x = x.mean(axis=(1, 2, 3))
        x = nn.Dense(self.mid_channels, use_bias=self.fc1_bias,
                     kernel_init=nn.initializers.normal(self.init_std),
                     dtype=self.dtype, name='fc1')(x)
        x = nn.relu(x)
        if self.dropout_ratio:
            x = nn.Dropout(rate=self.dropout_ratio,
                           deterministic=not train)(x)
        return nn.Dense(self.num_classes,
                        kernel_init=nn.initializers.normal(self.init_std),
                        dtype=self.dtype, name='fc2')(x)


@HEADS.register_module()
class SlowFastHead(BaseHead):
    """reference slowfast_head.py: concat pooled slow+fast features."""
    num_classes: int = 400
    in_channels: int = 2304
    loss_cls: Any = None
    spatial_type: str = 'avg'   # reference cfg surface; 'avg' pooling
    dropout_ratio: float = 0.8
    init_std: float = 0.01
    multi_class: bool = False
    label_smooth_eps: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, num_segs: int = 1):
        slow, fast = x
        pooled = jnp.concatenate([slow.mean(axis=(1, 2, 3)),
                                  fast.mean(axis=(1, 2, 3))], axis=-1)
        if self.dropout_ratio:
            pooled = nn.Dropout(rate=self.dropout_ratio,
                                deterministic=not train)(pooled)
        return nn.Dense(self.num_classes,
                        kernel_init=nn.initializers.normal(self.init_std),
                        dtype=self.dtype, name='fc_cls')(pooled)


@HEADS.register_module()
class TRNHead(BaseHead):
    """Temporal Relation Network head (reference trn_head.py:13-211):
    spatial pool -> dropout -> fc to hidden_dim -> relation consensus.
    'TRN' uses the single full-scale relation; 'TRNMultiScale' sums MLPs
    over frame subsets of every scale (up to 3 random combinations per
    scale, re-sampled each forward via the 'dropout' rng stream)."""
    num_classes: int = 400
    in_channels: int = 2048
    num_segments: int = 8
    loss_cls: Any = None
    spatial_type: str = 'avg'
    relation_type: str = 'TRNMultiScale'
    hidden_dim: int = 256
    dropout_ratio: float = 0.8
    init_std: float = 0.001
    multi_class: bool = False
    label_smooth_eps: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, num_segs: int = None):
        import itertools
        if x.ndim == 4:
            x = x.mean(axis=(1, 2)) if self.spatial_type == 'avg' else \
                x.reshape(x.shape[0], -1)
        if self.dropout_ratio:
            x = nn.Dropout(rate=self.dropout_ratio,
                           deterministic=not train)(x)
        feat = nn.Dense(self.hidden_dim,
                        kernel_init=nn.initializers.normal(self.init_std),
                        dtype=self.dtype, name='fc_cls')(x)
        feat = feat.reshape(-1, self.num_segments, self.hidden_dim)

        def fusion(z, scale, name):
            z = nn.relu(z.reshape(z.shape[0], scale * self.hidden_dim))
            z = nn.Dense(256, dtype=self.dtype, name=f'{name}_fc1')(z)
            return nn.Dense(self.num_classes, dtype=self.dtype,
                            name=f'{name}_fc2')(nn.relu(z))

        t = self.num_segments
        if self.relation_type == 'TRN':
            z = nn.relu(feat.reshape(feat.shape[0], -1))
            z = nn.Dense(512, dtype=self.dtype, name='fusion_fc1')(z)
            return nn.Dense(self.num_classes, dtype=self.dtype,
                            name='fusion_fc2')(nn.relu(z))

        # multi-scale: scales t, t-1, ..., 2
        score = fusion(feat, t, 'scale0')     # the single full relation
        for s_idx, scale in enumerate(range(t - 1, 1, -1)):
            rels = jnp.asarray(
                list(itertools.combinations(range(t), scale)),
                jnp.int32)                      # (n_rel, scale)
            n_sub = min(3, rels.shape[0])
            if train and rels.shape[0] > n_sub:
                rng = self.make_rng('dropout')
                pick = jax.random.choice(rng, rels.shape[0], (n_sub,),
                                         replace=False)
            else:
                pick = jnp.arange(n_sub)
            chosen = rels[pick]                 # (n_sub, scale)
            # (N, n_sub, scale, hidden)
            sub = feat[:, chosen.reshape(-1), :].reshape(
                feat.shape[0] * n_sub, scale, self.hidden_dim)
            s = fusion(sub, scale, f'scale{s_idx + 1}')
            score = score + s.reshape(feat.shape[0], n_sub,
                                      self.num_classes).sum(axis=1)
        return score
