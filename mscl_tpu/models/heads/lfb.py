"""Long-Term Feature Bank stack: LFB, FBO heads, LFBInferHead, ACRNHead.

Parity:
  - LFB (reference mmaction/models/common/lfb.py:18-189): a host-side
    {video_id: {timestamp: [roi features]}} store loaded from pkl;
    sampling gathers a window_size*K fixed-shape feature block around a
    keyframe (zero-padded) — host data prep, so the jitted step keeps
    static shapes (the reference's 'gpu'/'lmdb' residency options
    collapse to host numpy here).
  - NonLocalLayer / FBONonLocal / FBOAvg / FBOMax / FBOHead (reference
    heads/fbo_head.py:20-399): short-term RoI feature attends over the
    long-term bank; channels-last (N, S, C) layout, 1x1x1 convs as
    Dense, LayerNorm over (S, C) matching torch's
    LayerNorm([C, S, 1, 1]).
  - LFBInferHead (reference heads/lfb_infer_head.py:17-146): collects
    pooled RoI features + img_keys host-side; save() writes the
    reference's 'lfb_{mode}.pkl' layout (explicit save instead of
    __del__).
  - ACRNHead (reference heads/misc_head.py:16-134): Actor-Centric
    Relation Network — pooled RoI feature tiled over the context map,
    concatenated with the per-RoI global feature, fused by 1x1x1 +
    (1,3,3) convs.
"""
from __future__ import annotations

import os
import os.path as osp
import pickle
from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..builder import HEADS


class LFB:
    """Host-side long-term feature bank."""

    def __init__(self, lfb_prefix_path, max_num_sampled_feat=5,
                 window_size=60, lfb_channels=2048,
                 dataset_modes=('train', 'val'), device='cpu',
                 **kwargs):
        self.window_size = window_size
        self.max_num_sampled_feat = max_num_sampled_feat
        self.lfb_channels = lfb_channels
        if isinstance(dataset_modes, str):
            dataset_modes = (dataset_modes,)
        self.lfb: Dict[str, Dict[int, List[np.ndarray]]] = {}
        for mode in dataset_modes:
            path = osp.join(lfb_prefix_path, f'lfb_{mode}.pkl')
            with open(path, 'rb') as f:
                bank = pickle.load(f)
            for vid, secs in bank.items():
                self.lfb.setdefault(vid, {}).update(secs)

    def sample_long_term_features(self, video_id: str, timestamp: int,
                                  rng=None) -> np.ndarray:
        """(window_size * K, C), zero-padded (reference lfb.py:153-179)."""
        rng = rng or np.random.default_rng()
        video_features = self.lfb.get(video_id, {})
        w, k = self.window_size, self.max_num_sampled_feat
        out = np.zeros((w * k, self.lfb_channels), np.float32)
        start = timestamp - w // 2
        for idx, sec in enumerate(range(start, start + w)):
            feats = video_features.get(sec)
            if not feats:
                continue
            n_sampled = min(len(feats), k)
            for j, ri in enumerate(rng.choice(len(feats), n_sampled,
                                              replace=False)):
                out[idx * k + j] = np.asarray(feats[ri], np.float32)
        return out

    def __getitem__(self, img_key: str) -> np.ndarray:
        video_id, timestamp = img_key.split(',')
        return self.sample_long_term_features(video_id, int(timestamp))

    def __len__(self):
        return len(self.lfb)


def sample_lfb(lfb: LFB, img_keys, rng=None) -> np.ndarray:
    """Host-side lt_feat block for a RoI batch: (N, window*K, C)
    (reference fbo_head.py sample_lfb — a data-prep step here so the
    jitted FBOHead call keeps static shapes)."""
    return np.stack([lfb.sample_long_term_features(
        k.split(',')[0], int(k.split(',')[1]), rng=rng)
        for k in img_keys])


class NonLocalLayer(nn.Module):
    """reference fbo_head.py:20-170 on (N, S, C) features."""
    latent_channels: int
    out_channels: int
    use_scale: bool = True
    pre_activate: bool = True
    pre_activate_with_ln: bool = True
    dropout_ratio: float = 0.2
    zero_init_out_conv: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, st_feat, lt_feat, train: bool = False):
        c = self.latent_channels
        theta = nn.Dense(c, dtype=self.dtype, name='st_feat_conv')(
            st_feat)                                    # (N, S, c)
        phi = nn.Dense(c, dtype=self.dtype, name='lt_feat_conv')(
            lt_feat)                                    # (N, L, c)
        g = nn.Dense(c, dtype=self.dtype, name='global_conv')(lt_feat)

        attn = jnp.einsum('nsc,nlc->nsl', theta, phi)
        if self.use_scale:
            attn = attn / (c ** 0.5)
        p = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum('nsl,nlc->nsc', p, g)

        ln = nn.LayerNorm(reduction_axes=(-2, -1),
                          feature_axes=(-2, -1), name='ln')
        if self.pre_activate:
            if self.pre_activate_with_ln:
                out = ln(out)
            out = nn.relu(out)
        out = nn.Dense(
            self.out_channels,
            kernel_init=(nn.initializers.zeros if
                         self.zero_init_out_conv else
                         nn.initializers.lecun_normal()),
            dtype=self.dtype, name='out_conv')(out)
        if not self.pre_activate:
            out = ln(out)
        if self.dropout_ratio > 0:
            out = nn.Dropout(rate=self.dropout_ratio,
                             deterministic=not train)(out)
        return out


class FBONonLocal(nn.Module):
    """reference fbo_head.py:172-281."""
    st_feat_channels: int = 2048
    lt_feat_channels: int = 2048
    latent_channels: int = 512
    num_non_local_layers: int = 2
    st_feat_dropout_ratio: float = 0.2
    lt_feat_dropout_ratio: float = 0.2
    pre_activate: bool = True
    zero_init_out_conv: bool = False
    num_st_feat: int = 1
    num_lt_feat: int = 300
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, st_feat, lt_feat, train: bool = False):
        st = nn.Dense(self.latent_channels, dtype=self.dtype,
                      name='st_feat_conv')(st_feat)
        lt = nn.Dense(self.latent_channels, dtype=self.dtype,
                      name='lt_feat_conv')(lt_feat)
        if self.st_feat_dropout_ratio > 0:
            st = nn.Dropout(rate=self.st_feat_dropout_ratio,
                            deterministic=not train)(st)
        if self.lt_feat_dropout_ratio > 0:
            lt = nn.Dropout(rate=self.lt_feat_dropout_ratio,
                            deterministic=not train)(lt)
        for i in range(self.num_non_local_layers):
            identity = st
            nl_out = NonLocalLayer(
                self.latent_channels, self.latent_channels,
                pre_activate=self.pre_activate,
                zero_init_out_conv=self.zero_init_out_conv,
                dtype=self.dtype,
                name=f'non_local_layer_{i + 1}')(st, lt, train)
            st = identity + nl_out
            if not self.pre_activate:
                st = nn.relu(st)
        return st


@HEADS.register_module()
class FBOHead(nn.Module):
    """reference fbo_head.py:316-399: pooled RoI feature + FBO output
    concatenated. lt_feat arrives as a batch input (host-sampled by
    LFB, see sample_lfb)."""
    lfb_cfg: Any = None
    fbo_cfg: Any = None
    temporal_pool_type: str = 'avg'
    spatial_pool_type: str = 'max'
    dtype: Any = jnp.float32

    def setup(self):
        fbo = dict(self.fbo_cfg or dict(type='non_local'))
        fbo_type = fbo.pop('type', 'non_local')
        if fbo_type == 'non_local':
            self.fbo = FBONonLocal(dtype=self.dtype, **fbo)
        elif fbo_type in ('avg', 'max'):
            self.fbo = fbo_type
        else:
            raise KeyError(fbo_type)

    def __call__(self, x, lt_feat, train: bool = False):
        """x: (N, T, H, W, C) RoI features; lt_feat: (N, L, C)."""
        st = x.mean(axis=1) if self.temporal_pool_type == 'avg' else \
            x.max(axis=1)
        st = st.mean(axis=(1, 2)) if self.spatial_pool_type == 'avg' \
            else st.max(axis=(1, 2))                    # (N, C)
        identity = st
        st = st[:, None, :]                             # (N, 1, C)
        if isinstance(self.fbo, str):
            fbo_feat = (lt_feat.mean(axis=1) if self.fbo == 'avg'
                        else lt_feat.max(axis=1))
        else:
            fbo_feat = self.fbo(st, lt_feat, train)[:, 0]
        return jnp.concatenate([identity, fbo_feat], axis=-1)


@HEADS.register_module()
class LFBInferHead:
    """reference lfb_infer_head.py:17-146 — pure host-side collector."""

    def __init__(self, lfb_prefix_path, dataset_mode='train',
                 use_half_precision=True, temporal_pool_type='avg',
                 spatial_pool_type='max', **kwargs):
        os.makedirs(lfb_prefix_path, exist_ok=True)
        self.lfb_prefix_path = lfb_prefix_path
        self.dataset_mode = dataset_mode
        self.use_half_precision = use_half_precision
        self.temporal_pool_type = temporal_pool_type
        self.spatial_pool_type = spatial_pool_type
        self.all_features: List[np.ndarray] = []
        self.all_metadata: List[str] = []

    def __call__(self, x, rois, img_metas):
        """x: (N, T, h, w, C) RoI features (numpy or jax)."""
        x = np.asarray(x)
        feat = x.mean(axis=1) if self.temporal_pool_type == 'avg' else \
            x.max(axis=1)
        feat = feat.mean(axis=(1, 2)) if self.spatial_pool_type == \
            'avg' else feat.max(axis=(1, 2))
        if self.use_half_precision:
            feat = feat.astype(np.float16)
        inds = np.asarray(rois)[:, 0].astype(np.int64)
        for i, ind in enumerate(inds):
            self.all_metadata.append(img_metas[int(ind)]['img_key'])
            self.all_features.append(feat[i])
        return x

    def save(self):
        assert len(self.all_features) == len(self.all_metadata)
        bank: Dict[str, Dict[int, list]] = {}
        for feature, metadata in zip(self.all_features,
                                     self.all_metadata):
            video_id, timestamp = metadata.split(',')
            bank.setdefault(video_id, {}).setdefault(
                int(timestamp), []).append(np.squeeze(feature))
        path = osp.join(self.lfb_prefix_path,
                        f'lfb_{self.dataset_mode}.pkl')
        with open(path, 'wb') as f:
            pickle.dump(bank, f)
        return path


@HEADS.register_module()
class ACRNHead(nn.Module):
    """reference misc_head.py:16-134 on channels-last features."""
    in_channels: int = 4096
    out_channels: int = 2048
    stride: int = 1
    num_convs: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, feat, rois, train: bool = False):
        """x: (N, T, h, w, C) RoI features; feat: (B, T, H, W, C)
        context; rois: (N, 5)."""
        pooled = x.max(axis=(1, 2, 3), keepdims=True)   # (N,1,1,1,C)
        t, h, w = feat.shape[1], feat.shape[2], feat.shape[3]
        tiled = jnp.broadcast_to(
            pooled, (x.shape[0], t, h, w, pooled.shape[-1]))
        inds = rois[:, 0].astype(jnp.int32)
        gfeat = feat[inds]                              # (N, T, H, W, C)
        y = jnp.concatenate([tiled, gfeat], axis=-1)

        def convbn(z, feats, kernel, stride, name):
            z = nn.Conv(feats, kernel, strides=stride,
                        padding='SAME', use_bias=False,
                        dtype=self.dtype, name=f'{name}_conv')(z)
            z = nn.BatchNorm(use_running_average=not train,
                             momentum=0.9, epsilon=1e-5,
                             dtype=self.dtype, name=f'{name}_bn')(z)
            return nn.relu(z)

        y = convbn(y, self.out_channels, (1, 1, 1), (1, 1, 1), 'conv1')
        y = convbn(y, self.out_channels, (1, 3, 3),
                   (1, self.stride, self.stride), 'conv2')
        for i in range(self.num_convs - 1):
            y = convbn(y, self.out_channels, (1, 3, 3), (1, 1, 1),
                       f'conv{i + 3}')
        return y
