"""Native implementations of the external-library 2D backbones the
reference's TSN "custom_backbones" configs name.

The reference dispatches these three names to third-party packages
(reference mmaction/models/builder.py:26-60: ``torchvision.*`` /
``timm.*`` / ``mmcls.*`` prefixes import the external model zoo):

- ``mmcls.ResNeXt`` (depth 101, 32x4d) —
  configs/recognition/tsn/custom_backbones/tsn_rn101_32x4d_*.py
- ``torchvision.densenet161`` —
  configs/recognition/tsn/custom_backbones/tsn_dense161_*.py
- ``timm.swin_base_patch4_window7_224`` —
  configs/recognition/tsn/custom_backbones/tsn_swin_transformer_*.py

Here they are first-class TPU-native flax backbones (NHWC, BN in f32,
MXU-friendly dense/conv blocks) registered under the reference's
external names so those configs build and trace like any other.
``pretrained=True`` is accepted and ignored (no external weight zoo in
this environment; use utils/torch_weights.py to import checkpoints).
"""
from __future__ import annotations

from typing import Any, Sequence

import numpy as np

import jax.numpy as jnp
from flax import linen as nn

from ..builder import BACKBONES
from .video_resnet import kaiming_normal_fan_out
from .resnet2d import ConvBN2d
from ...ops.split_bn import make_bn

ARCH_NEXT = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3), 152: (3, 8, 36, 3)}


class BottleneckX(nn.Module):
    """ResNeXt bottleneck: 1x1 -> grouped 3x3 -> 1x1 (width =
    planes * width_per_group * groups / 64, torchvision/mmcls math)."""
    planes: int
    stride: int = 1
    downsample: bool = False
    groups: int = 32
    width_per_group: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        width = int(self.planes * self.width_per_group *
                    self.groups / 64.)
        residual = x
        y = ConvBN2d(width, (1, 1), (1, 1), (0, 0), dtype=self.dtype,
                     name='conv1')(x, train)
        y = nn.Conv(width, (3, 3), strides=(self.stride,) * 2,
                    padding=[(1, 1), (1, 1)], use_bias=False,
                    feature_group_count=self.groups,
                    kernel_init=kaiming_normal_fan_out(),
                    dtype=self.dtype, name='conv2')(y)
        y = make_bn(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name='bn2')(y)
        y = nn.relu(y)
        y = ConvBN2d(self.planes * 4, (1, 1), (1, 1), (0, 0), relu=False,
                     dtype=self.dtype, name='conv3')(y, train)
        if self.downsample:
            residual = ConvBN2d(self.planes * 4, (1, 1),
                                (self.stride,) * 2, (0, 0), relu=False,
                                dtype=self.dtype, name='downsample')(
                                    x, train)
        return nn.relu(y + residual)


@BACKBONES.register_module()
@BACKBONES.register_module(name='mmcls.ResNeXt')
class ResNeXt(nn.Module):
    """ResNeXt over (N*T, H, W, C) frames (mmcls.ResNeXt semantics)."""
    depth: int = 101
    num_stages: int = 4
    out_indices: Sequence[int] = (3,)
    strides: Sequence[int] = (1, 2, 2, 2)
    groups: int = 32
    width_per_group: int = 4
    style: str = 'pytorch'        # accepted cfg surface (conv placement
    frozen_stages: int = -1       # semantics fixed at torchvision's)
    norm_eval: bool = False
    norm_cfg: Any = None
    pretrained: Any = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn_train = train and not self.norm_eval
        blocks = ARCH_NEXT[self.depth]
        x = ConvBN2d(64, (7, 7), (2, 2), (3, 3), dtype=self.dtype,
                     name='conv1')(x, bn_train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2),
                        padding=[(1, 1), (1, 1)])
        outs = []
        in_planes = 64
        for i in range(self.num_stages):
            planes = 64 * (2 ** i)
            for b in range(blocks[i]):
                stride = self.strides[i] if b == 0 else 1
                need_ds = (b == 0) and (stride != 1 or
                                        in_planes != planes * 4)
                x = BottleneckX(planes, stride, need_ds,
                                groups=self.groups,
                                width_per_group=self.width_per_group,
                                dtype=self.dtype,
                                name=f'layer{i + 1}_{b}')(x, bn_train)
                in_planes = planes * 4
            outs.append(x)
        outs = [outs[i] for i in self.out_indices]
        return outs[0] if len(outs) == 1 else outs


# --------------------------------------------------------------- DenseNet
class DenseLayer(nn.Module):
    """BN-ReLU-Conv1x1(bn_size*k) -> BN-ReLU-Conv3x3(k), concatenated
    onto the running feature map (torchvision densenet._DenseLayer)."""
    growth_rate: int
    bn_size: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = make_bn(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name='norm1')(x)
        y = nn.relu(y)
        y = nn.Conv(self.bn_size * self.growth_rate, (1, 1),
                    use_bias=False, kernel_init=kaiming_normal_fan_out(),
                    dtype=self.dtype, name='conv1')(y)
        y = make_bn(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name='norm2')(y)
        y = nn.relu(y)
        y = nn.Conv(self.growth_rate, (3, 3), padding=[(1, 1), (1, 1)],
                    use_bias=False, kernel_init=kaiming_normal_fan_out(),
                    dtype=self.dtype, name='conv2')(y)
        return jnp.concatenate([x, y], axis=-1)


@BACKBONES.register_module(name='torchvision.densenet161')
@BACKBONES.register_module()
class DenseNet(nn.Module):
    """DenseNet over (N*T, H, W, C) frames. Defaults are DenseNet-161
    (torchvision: init 96, growth 48, blocks (6,12,36,24) -> 2208ch)."""
    num_init_features: int = 96
    growth_rate: int = 48
    block_config: Sequence[int] = (6, 12, 36, 24)
    bn_size: int = 4
    pretrained: Any = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.num_init_features, (7, 7), strides=(2, 2),
                    padding=[(3, 3), (3, 3)], use_bias=False,
                    kernel_init=kaiming_normal_fan_out(),
                    dtype=self.dtype, name='conv0')(x)
        x = make_bn(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name='norm0')(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2),
                        padding=[(1, 1), (1, 1)])
        feats = self.num_init_features
        for i, layers in enumerate(self.block_config):
            for j in range(layers):
                x = DenseLayer(self.growth_rate, self.bn_size,
                               dtype=self.dtype,
                               name=f'block{i + 1}_layer{j + 1}')(x, train)
            feats += layers * self.growth_rate
            if i != len(self.block_config) - 1:
                # transition: BN-ReLU-Conv1x1(half) + avgpool/2
                x = make_bn(use_running_average=not train,
                                 momentum=0.9, epsilon=1e-5,
                                 dtype=self.dtype,
                                 name=f'transition{i + 1}_norm')(x)
                x = nn.relu(x)
                feats //= 2
                x = nn.Conv(feats, (1, 1), use_bias=False,
                            kernel_init=kaiming_normal_fan_out(),
                            dtype=self.dtype,
                            name=f'transition{i + 1}_conv')(x)
                x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        x = make_bn(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name='norm5')(x)
        return nn.relu(x)


# ------------------------------------------------------------------- Swin
def _rel_position_index(ws: int) -> np.ndarray:
    """(ws*ws, ws*ws) index into the (2ws-1)^2 relative-bias table
    (timm swin_transformer.get_relative_position_index)."""
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws),
                                  indexing='ij'))          # (2, ws, ws)
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]              # (2, L, L)
    rel = rel.transpose(1, 2, 0) + (ws - 1)
    return rel[..., 0] * (2 * ws - 1) + rel[..., 1]


def _shift_attn_mask(hp: int, wp: int, ws: int, shift: int) -> np.ndarray:
    """(nW, L, L) additive attention mask for shifted windows (timm
    WindowAttention mask: cross-region pairs get -100)."""
    img = np.zeros((hp, wp))
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for vs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img[hs, vs] = cnt
            cnt += 1
    win = img.reshape(hp // ws, ws, wp // ws, ws)
    win = win.transpose(0, 2, 1, 3).reshape(-1, ws * ws)   # (nW, L)
    mask = win[:, None, :] - win[:, :, None]
    return np.where(mask != 0, -100.0, 0.0).astype(np.float32)


class SwinBlock(nn.Module):
    """One Swin transformer block: (shifted-)window MSA + MLP, pre-LN,
    relative position bias (timm swin_transformer.SwinTransformerBlock).
    Operates on (N, H, W, C); pads H/W to window multiples."""
    num_heads: int
    window: int = 7
    shift: bool = False
    mlp_ratio: float = 4.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        n, h, w, c = x.shape
        ws = min(self.window, h, w)
        # timm: when the input fits in one window, shifting is a no-op
        shift = ws // 2 if (self.shift and (h > ws or w > ws)) else 0
        hp = -(-h // ws) * ws
        wp = -(-w // ws) * ws

        shortcut = x
        y = nn.LayerNorm(dtype=self.dtype, name='norm1')(x)
        y = jnp.pad(y, ((0, 0), (0, hp - h), (0, wp - w), (0, 0)))
        if shift:
            y = jnp.roll(y, (-shift, -shift), axis=(1, 2))
        # window partition -> (n*nW, L, C)
        nwh, nww = hp // ws, wp // ws
        y = y.reshape(n, nwh, ws, nww, ws, c)
        y = y.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, c)

        heads, hd = self.num_heads, c // self.num_heads
        qkv = nn.Dense(3 * c, dtype=self.dtype, name='qkv')(y)
        q, k, v = jnp.split(qkv.reshape(-1, ws * ws, 3, heads, hd)
                            .transpose(2, 0, 3, 1, 4), 3, axis=0)
        q, k, v = q[0], k[0], v[0]                         # (B', heads, L, hd)
        attn = (q * (hd ** -0.5)) @ k.transpose(0, 1, 3, 2)
        bias_table = self.param(
            'relative_position_bias_table',
            nn.initializers.truncated_normal(0.02),
            ((2 * ws - 1) ** 2, heads))
        idx = _rel_position_index(ws)
        attn = attn + bias_table[idx].transpose(2, 0, 1)[None]
        if shift:
            mask = jnp.asarray(_shift_attn_mask(hp, wp, ws, shift))
            attn = (attn.reshape(n, -1, heads, ws * ws, ws * ws) +
                    mask[None, :, None]).reshape(-1, heads, ws * ws,
                                                 ws * ws)
        attn = nn.softmax(attn.astype(jnp.float32), axis=-1) \
            .astype(self.dtype)
        y = (attn @ v).transpose(0, 2, 1, 3).reshape(-1, ws * ws, c)
        y = nn.Dense(c, dtype=self.dtype, name='proj')(y)

        # merge windows back -> (n, hp, wp, c)
        y = y.reshape(n, nwh, nww, ws, ws, c)
        y = y.transpose(0, 1, 3, 2, 4, 5).reshape(n, hp, wp, c)
        if shift:
            y = jnp.roll(y, (shift, shift), axis=(1, 2))
        y = y[:, :h, :w]
        x = shortcut + y

        y = nn.LayerNorm(dtype=self.dtype, name='norm2')(x)
        y = nn.Dense(int(c * self.mlp_ratio), dtype=self.dtype,
                     name='fc1')(y)
        y = nn.gelu(y, approximate=False)   # timm uses exact-erf GELU
        y = nn.Dense(c, dtype=self.dtype, name='fc2')(y)
        return x + y


class PatchMerging(nn.Module):
    """2x2 neighborhood concat -> LN -> Dense(2C, no bias)."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        n, h, w, c = x.shape
        x = jnp.pad(x, ((0, 0), (0, h % 2), (0, w % 2), (0, 0)))
        x = jnp.concatenate([x[:, 0::2, 0::2], x[:, 1::2, 0::2],
                             x[:, 0::2, 1::2], x[:, 1::2, 1::2]], axis=-1)
        x = nn.LayerNorm(dtype=self.dtype, name='norm')(x)
        return nn.Dense(2 * c, use_bias=False, dtype=self.dtype,
                        name='reduction')(x)


@BACKBONES.register_module(name='timm.swin_base_patch4_window7_224')
@BACKBONES.register_module()
class SwinTransformer(nn.Module):
    """Swin transformer over (N*T, H, W, C) frames; defaults are Swin-B
    (patch 4, window 7, embed 128, depths (2,2,18,2), heads (4,8,16,32)).
    Returns the final-stage feature map as NHWC (N, H/32, W/32, 1024) so
    TSNHead's spatial pooling applies unchanged."""
    patch_size: int = 4
    window: int = 7
    embed_dim: int = 128
    depths: Sequence[int] = (2, 2, 18, 2)
    num_heads: Sequence[int] = (4, 8, 16, 32)
    mlp_ratio: float = 4.0
    pretrained: Any = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = self.patch_size
        x = nn.Conv(self.embed_dim, (p, p), strides=(p, p),
                    dtype=self.dtype, name='patch_embed')(x)
        x = nn.LayerNorm(dtype=self.dtype, name='patch_norm')(x)
        for i, depth in enumerate(self.depths):
            if i > 0:
                x = PatchMerging(dtype=self.dtype,
                                 name=f'merge{i}')(x)
            for b in range(depth):
                x = SwinBlock(self.num_heads[i], self.window,
                              shift=bool(b % 2), mlp_ratio=self.mlp_ratio,
                              dtype=self.dtype,
                              name=f'stage{i + 1}_block{b}')(x, train)
        return nn.LayerNorm(dtype=self.dtype, name='norm')(x)
