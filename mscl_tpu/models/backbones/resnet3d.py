"""MM2-style ResNet3d family in flax (NTHWC): ResNet3d, ResNet3dSlowOnly,
ResNet3dSlowFast.

Parity: reference mmaction/models/backbones/resnet3d.py (BasicBlock3d
:23-160, Bottleneck3d :162-335 with 'pytorch' style putting the stride on
conv2 and inflate_style '3x1x1'; ResNet3d :338-870 with conv1_kernel,
pool1 (1,3,3), optional pool2 (2,1,1) after stage 1) and
resnet3d_slowonly.py:16-53 (SlowOnly defaults: conv1_kernel (1,7,7),
inflate (0,0,1,1), with_pool2=False). SlowFast parity:
resnet3d_slowfast.py — two pathways with time-strided lateral conv
connections fused into the slow path.

Used by the mscl_r50 recipe (configs/recognition/moco/
mscl_r50_cosm_lr3e-2.py: ResNet3dSlowOnly depth 50, conv1_kernel (5,7,7),
conv1_stride_t 2, out_indices (0,1,2,3)).
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..builder import BACKBONES
from .video_resnet import ConvBN, kaiming_normal_fan_out
from ...ops.conv3d import temporal_subsample
from ...ops.split_bn import make_bn

ARCH_SETTINGS = {
    18: ('basic', (2, 2, 2, 2)),
    34: ('basic', (3, 4, 6, 3)),
    50: ('bottleneck', (3, 4, 6, 3)),
    101: ('bottleneck', (3, 4, 23, 3)),
    152: ('bottleneck', (3, 8, 36, 3)),
}


class NonLocal3d(nn.Module):
    """Embedded-gaussian non-local block (mmcv NonLocal3d semantics as
    configured by the reference nl configs: sub_sample, use_scale,
    BN3d-normalized conv_out with zero-init gamma so the block starts as
    identity — reference resnet3d.py:130-132,156 applies it after the
    residual block).

    Attention over all (t, h, w) positions: y = softmax(theta.phi^T).g;
    out = x + BN(conv_out(y)).
    """
    in_channels: int
    reduction: int = 2
    use_scale: bool = True
    sub_sample: bool = False
    mode: str = 'embedded_gaussian'   # | 'gaussian' | 'dot_product'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert self.mode in ('embedded_gaussian', 'gaussian',
                             'dot_product'), self.mode
        ic = max(self.in_channels // self.reduction, 1)
        n, t, h, w, _ = x.shape
        kw = dict(use_bias=True, dtype=self.dtype,
                  kernel_init=kaiming_normal_fan_out())
        kv_in = x
        if self.sub_sample:        # (1, 2, 2) max pool on phi/g inputs
            kv_in = nn.max_pool(x, (1, 2, 2), strides=(1, 2, 2))
        g = nn.Conv(ic, (1, 1, 1), name='g', **kw)(kv_in)
        if self.mode == 'gaussian':
            # pairwise on the raw features (mmcv _NonLocalNd gaussian)
            q = x.reshape(n, t * h * w, x.shape[-1])
            k = kv_in.reshape(n, -1, x.shape[-1])
        else:
            theta = nn.Conv(ic, (1, 1, 1), name='theta', **kw)(x)
            phi = nn.Conv(ic, (1, 1, 1), name='phi', **kw)(kv_in)
            q = theta.reshape(n, t * h * w, ic)
            k = phi.reshape(n, -1, ic)
        v = g.reshape(n, -1, ic)
        attn = jnp.einsum('nqc,nkc->nqk', q, k)
        if self.mode == 'dot_product':
            # mean-normalized, no softmax (mmcv dot_product pairwise)
            attn = attn / jnp.asarray(attn.shape[-1], attn.dtype)
        else:
            if self.mode == 'embedded_gaussian' and self.use_scale:
                attn = attn / jnp.sqrt(jnp.asarray(ic, attn.dtype))
            attn = jax.nn.softmax(attn, axis=-1)
        y = jnp.einsum('nqk,nkc->nqc', attn, v).reshape(n, t, h, w, ic)
        y = nn.Conv(self.in_channels, (1, 1, 1), name='conv_out',
                    **kw)(y)
        # zero-init gamma: the block is an identity at initialization
        y = make_bn(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, scale_init=nn.initializers.zeros,
                         dtype=self.dtype, name='bn_out')(y)
        return x + y


class BasicBlock3d(nn.Module):
    planes: int
    spatial_stride: int = 1
    temporal_stride: int = 1
    dilation: int = 1
    inflate: bool = True
    downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        k1 = (3, 3, 3) if self.inflate else (1, 3, 3)
        p1 = tuple(k // 2 for k in k1)
        residual = x
        out = ConvBN(self.planes, k1,
                     (self.temporal_stride, self.spatial_stride,
                      self.spatial_stride), p1, dtype=self.dtype,
                     name='conv1')(x, train)
        k2 = (3, 3, 3) if self.inflate else (1, 3, 3)
        out = ConvBN(self.planes, k2, (1, 1, 1),
                     tuple(k // 2 for k in k2), relu=False,
                     dtype=self.dtype, name='conv2')(out, train)
        if self.downsample:
            residual = ConvBN(
                self.planes, (1, 1, 1),
                (self.temporal_stride, self.spatial_stride,
                 self.spatial_stride), (0, 0, 0), relu=False,
                dtype=self.dtype, name='downsample')(x, train)
        return nn.relu(out + residual)


class Bottleneck3d(nn.Module):
    """'pytorch' style: spatial/temporal stride on conv2
    (reference resnet3d.py:228-237)."""
    planes: int
    spatial_stride: int = 1
    temporal_stride: int = 1
    dilation: int = 1
    inflate: bool = True
    inflate_style: str = '3x1x1'
    downsample: bool = False
    dtype: Any = jnp.float32
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.inflate:
            if self.inflate_style == '3x1x1':
                k1, p1 = (3, 1, 1), (1, 0, 0)
                k2 = (1, 3, 3)
                p2 = (0, self.dilation, self.dilation)
            else:
                k1, p1 = (1, 1, 1), (0, 0, 0)
                k2 = (3, 3, 3)
                p2 = (1, self.dilation, self.dilation)
        else:
            k1, p1 = (1, 1, 1), (0, 0, 0)
            k2 = (1, 3, 3)
            p2 = (0, self.dilation, self.dilation)

        residual = x
        out = ConvBN(self.planes, k1, (1, 1, 1), p1, dtype=self.dtype,
                     name='conv1')(x, train)
        out = nn.Conv(self.planes, k2,
                      strides=(self.temporal_stride, self.spatial_stride,
                               self.spatial_stride),
                      padding=[(p, p) for p in p2],
                      kernel_dilation=(1, self.dilation, self.dilation),
                      use_bias=False,
                      kernel_init=kaiming_normal_fan_out(),
                      dtype=self.dtype, name='conv2_conv')(out)
        out = make_bn(use_running_average=not train, momentum=0.9,
                           epsilon=1e-5, dtype=self.dtype,
                           name='conv2_bn')(out)
        out = nn.relu(out)
        out = ConvBN(self.planes * self.expansion, (1, 1, 1), (1, 1, 1),
                     (0, 0, 0), relu=False, dtype=self.dtype,
                     name='conv3')(out, train)
        if self.downsample:
            residual = ConvBN(
                self.planes * self.expansion, (1, 1, 1),
                (self.temporal_stride, self.spatial_stride,
                 self.spatial_stride), (0, 0, 0), relu=False,
                dtype=self.dtype, name='downsample')(x, train)
        return nn.relu(out + residual)


def _max_pool3d(x, kernel, stride, padding):
    return nn.max_pool(
        x, kernel, strides=stride,
        padding=[(p, p) for p in padding])


@BACKBONES.register_module()
class ResNet3d(nn.Module):
    depth: int = 50
    pretrained: Any = None
    stage_blocks: Any = None
    pretrained2d: bool = True
    in_channels: int = 3
    num_stages: int = 4
    base_channels: int = 64
    out_indices: Sequence[int] = (3,)
    spatial_strides: Sequence[int] = (1, 2, 2, 2)
    temporal_strides: Sequence[int] = (1, 1, 1, 1)
    dilations: Sequence[int] = (1, 1, 1, 1)
    conv1_kernel: Sequence[int] = (3, 7, 7)
    conv1_stride_s: int = 2
    conv1_stride_t: int = 1
    pool1_stride_s: int = 2
    pool1_stride_t: int = 1
    with_pool1: bool = True
    with_pool2: bool = True
    style: str = 'pytorch'
    frozen_stages: int = -1
    inflate: Any = (1, 1, 1, 1)
    inflate_style: str = '3x1x1'
    norm_eval: bool = False
    with_cp: bool = False
    non_local: Any = (0, 0, 0, 0)
    non_local_cfg: Any = None
    zero_init_residual: bool = True
    lateral: bool = False
    conv_cfg: Any = None
    norm_cfg: Any = None
    act_cfg: Any = None
    # also return the post-pool1 stem features (the SlowFast fast
    # pathway exposes them for the conv1_lateral fusion)
    return_stem: bool = False
    dtype: Any = jnp.float32

    def _stage_inflations(self):
        inf = self.inflate
        if isinstance(inf, int):
            inf = (inf,) * self.num_stages
        return inf

    def _nl_flag(self, stage_idx, block_idx):
        spec = self.non_local
        if not spec:
            return False
        stage_spec = spec[stage_idx] if stage_idx < len(spec) else 0
        if isinstance(stage_spec, (list, tuple)):
            return bool(stage_spec[block_idx]) \
                if block_idx < len(stage_spec) else False
        return bool(stage_spec)

    def _bn_train(self, train: bool) -> bool:
        # norm_eval (and CSN's bn_frozen alias): BN uses running
        # statistics even in training mode (reference resnet3d.py
        # _freeze_stages/norm_eval semantics)
        frozen = self.norm_eval or getattr(self, 'bn_frozen', False)
        return train and not frozen

    @nn.compact
    def __call__(self, x, train: bool = False, laterals=None):
        train = self._bn_train(train)
        block_type, default_blocks = ARCH_SETTINGS[self.depth]
        stage_blocks = self.stage_blocks or \
            default_blocks[:self.num_stages]
        block_cls = BasicBlock3d if block_type == 'basic' else \
            Bottleneck3d
        expansion = 1 if block_type == 'basic' else 4
        inflations = self._stage_inflations()

        k = tuple(self.conv1_kernel)
        x = ConvBN(self.base_channels, k,
                   (self.conv1_stride_t, self.conv1_stride_s,
                    self.conv1_stride_s),
                   tuple((kk - 1) // 2 for kk in k),
                   dtype=self.dtype, name='conv1')(x, train)
        if self.with_pool1:
            x = _max_pool3d(x, (1, 3, 3),
                            (self.pool1_stride_t, self.pool1_stride_s,
                             self.pool1_stride_s), (0, 1, 1))
        stem_feat = x

        outs = []
        in_planes = self.base_channels
        for i, num_blocks in enumerate(stage_blocks):
            planes = self.base_channels * (2 ** i)
            ss = self.spatial_strides[i]
            ts = self.temporal_strides[i]
            if laterals is not None and laterals[i] is not None:
                x = jnp.concatenate([x, laterals[i]], axis=-1)
                in_planes = x.shape[-1]
            for b in range(num_blocks):
                need_ds = (b == 0) and (
                    ss != 1 or ts != 1 or
                    in_planes != planes * expansion)
                x = block_cls(
                    planes,
                    spatial_stride=ss if b == 0 else 1,
                    temporal_stride=ts if b == 0 else 1,
                    dilation=self.dilations[i],
                    inflate=bool(inflations[i][b] if isinstance(
                        inflations[i], (list, tuple))
                        else inflations[i]),
                    downsample=need_ds, dtype=self.dtype,
                    name=f'layer{i + 1}_{b}')(x, train)
                in_planes = planes * expansion
                if self._nl_flag(i, b):
                    nl_cfg = dict(self.non_local_cfg or {})
                    nl_cfg.pop('norm_cfg', None)   # BN3d is the default
                    x = NonLocal3d(in_planes, dtype=self.dtype,
                                   name=f'layer{i + 1}_{b}_nonlocal',
                                   **nl_cfg)(x, train)
            if i == 0 and self.with_pool2:
                x = _max_pool3d(x, (2, 1, 1), (2, 1, 1), (0, 0, 0))
            outs.append(x)
        outs = [outs[i] for i in self.out_indices]
        if self.return_stem:
            return stem_feat, outs
        if len(outs) == 1:
            return outs[0]
        return outs


@BACKBONES.register_module()
class ResNet3dSlowOnly(ResNet3d):
    """SlowOnly pathway (reference resnet3d_slowonly.py:16-53)."""
    conv1_kernel: Sequence[int] = (1, 7, 7)
    conv1_stride_t: int = 1
    pool1_stride_t: int = 1
    inflate: Any = (0, 0, 1, 1)
    with_pool2: bool = False


@BACKBONES.register_module()
class ResNet3dSlowFast(nn.Module):
    """Two-pathway SlowFast (reference resnet3d_slowfast.py): slow path
    sees every ``resample_rate*speed_ratio``-th frame, fast path every
    ``resample_rate``-th; fast features feed time-strided lateral convs
    concatenated into the slow path before each stage."""
    pretrained: Any = None
    resample_rate: int = 8
    speed_ratio: int = 8
    channel_ratio: int = 8
    slow_pathway: Any = None
    fast_pathway: Any = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        slow_cfg = dict(self.slow_pathway or dict(
            depth=50, lateral=True, conv1_kernel=(1, 7, 7),
            inflate=(0, 0, 1, 1)))
        fast_cfg = dict(self.fast_pathway or dict(
            depth=50, lateral=False, base_channels=8,
            conv1_kernel=(5, 7, 7), conv1_stride_t=1, pool1_stride_t=1))
        slow_cfg.pop('type', None)
        fast_cfg.pop('type', None)
        lateral = slow_cfg.pop('lateral', True)
        fusion_kernel = int(slow_cfg.pop('fusion_kernel', 5))
        fast_cfg.pop('lateral', None)
        fast_cfg.pop('fusion_kernel', None)
        slow_cfg.setdefault('with_pool2', False)
        fast_cfg.setdefault('with_pool2', False)
        slow_cfg.setdefault('pretrained', None)
        fast_cfg.setdefault('pretrained', None)
        slow_cfg.setdefault('out_indices', (0, 1, 2, 3))
        fast_cfg.setdefault('out_indices', (0, 1, 2, 3))

        x_slow = temporal_subsample(x, self.resample_rate)
        x_fast = temporal_subsample(
            x, max(self.resample_rate // self.speed_ratio, 1))

        fast = ResNet3dSlowOnly(dtype=self.dtype, name='fast_path',
                                return_stem=True, **fast_cfg)
        stem_fast, fast_outs = fast(x_fast, train=train)

        laterals = [None, None, None, None]
        if lateral:
            # reference resnet3d_slowfast.py:507-521: FOUR fusion
            # points — fast's post-pool stem output before slow layer1
            # (conv1_lateral) and fast layer1..3 outputs before slow
            # layer2..4; each lateral is a (5,1,1)/stride-(alpha,1,1)
            # bias-free conv to 2x its input channels
            alpha = self.speed_ratio
            fk = fusion_kernel
            srcs = [stem_fast, fast_outs[0], fast_outs[1], fast_outs[2]]
            for i, src in enumerate(srcs):
                laterals[i] = nn.Conv(
                    src.shape[-1] * 2, (fk, 1, 1),
                    strides=(alpha, 1, 1),
                    padding=[(fk // 2, fk // 2), (0, 0), (0, 0)],
                    use_bias=False,
                    dtype=self.dtype, name=f'lateral_{i}')(src)

        slow = ResNet3dSlowOnly(dtype=self.dtype, name='slow_path',
                                **slow_cfg)
        slow_outs = slow(x_slow, train=train, laterals=laterals)
        slow_last = slow_outs[-1] if isinstance(slow_outs, list) else \
            slow_outs
        fast_last = fast_outs[-1] if isinstance(fast_outs, list) else \
            fast_outs
        return (slow_last, fast_last)


@BACKBONES.register_module()
class ResNet3dCSN(ResNet3d):
    """Channel-Separated Network (ir-CSN) — parity: reference
    mmaction/models/backbones/resnet3d_csn.py: Bottleneck3d whose 3x3x3
    conv2 is depthwise. Implemented by marking the conv2 depthwise via
    bottleneck_mode."""
    bottleneck_mode: str = 'ir'
    bn_frozen: bool = False
    conv1_kernel: Sequence[int] = (3, 7, 7)
    conv1_stride_t: int = 1
    pool1_stride_t: int = 1
    inflate_style: str = '3x3x3'
    inflate: Any = (1, 1, 1, 1)
    with_pool2: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False, laterals=None):
        train = self._bn_train(train)
        assert self.bottleneck_mode in ('ir', 'ip'), self.bottleneck_mode
        # reuse ResNet3d topology with a depthwise conv2 bottleneck
        block_type, default_blocks = ARCH_SETTINGS[self.depth]
        assert block_type == 'bottleneck', 'CSN requires depth >= 50'
        stage_blocks = self.stage_blocks or \
            default_blocks[:self.num_stages]
        k = tuple(self.conv1_kernel)
        x = ConvBN(self.base_channels, k,
                   (self.conv1_stride_t, self.conv1_stride_s,
                    self.conv1_stride_s),
                   tuple((kk - 1) // 2 for kk in k),
                   dtype=self.dtype, name='conv1')(x, train)
        if self.with_pool1:
            x = _max_pool3d(x, (1, 3, 3),
                            (self.pool1_stride_t, self.pool1_stride_s,
                             self.pool1_stride_s), (0, 1, 1))
        outs = []
        in_planes = self.base_channels
        for i, num_blocks in enumerate(stage_blocks):
            planes = self.base_channels * (2 ** i)
            ss = self.spatial_strides[i]
            ts = self.temporal_strides[i]
            for b in range(num_blocks):
                s_sp = ss if b == 0 else 1
                s_t = ts if b == 0 else 1
                need_ds = (b == 0) and (s_sp != 1 or s_t != 1 or
                                        in_planes != planes * 4)
                x = _CSNBottleneck(planes, s_sp, s_t, need_ds,
                                   mode=self.bottleneck_mode,
                                   dtype=self.dtype,
                                   name=f'layer{i + 1}_{b}')(x, train)
                in_planes = planes * 4
            outs.append(x)
        outs = [outs[i] for i in self.out_indices]
        return outs[0] if len(outs) == 1 else outs


class _CSNBottleneck(nn.Module):
    planes: int
    spatial_stride: int = 1
    temporal_stride: int = 1
    downsample: bool = False
    mode: str = 'ir'      # 'ir' | 'ip' (reference resnet3d_csn.py:21-63)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        out = ConvBN(self.planes, (1, 1, 1), (1, 1, 1), (0, 0, 0),
                     dtype=self.dtype, name='conv1')(x, train)
        if self.mode == 'ip':
            # interaction-preserved: a bias-free 1x1x1 channel-mixing
            # conv precedes the depthwise conv
            out = nn.Conv(self.planes, (1, 1, 1), use_bias=False,
                          kernel_init=kaiming_normal_fan_out(),
                          dtype=self.dtype, name='conv2_ip')(out)
        # depthwise 3x3x3 (the channel separation)
        out_c = nn.Conv(self.planes, (3, 3, 3),
                        strides=(self.temporal_stride,
                                 self.spatial_stride,
                                 self.spatial_stride),
                        padding=[(1, 1)] * 3,
                        feature_group_count=self.planes, use_bias=False,
                        kernel_init=kaiming_normal_fan_out(),
                        dtype=self.dtype, name='conv2_dw')(out)
        out = make_bn(use_running_average=not train, momentum=0.9,
                           epsilon=1e-5, dtype=self.dtype,
                           name='conv2_bn')(out_c)
        out = nn.relu(out)
        out = ConvBN(self.planes * 4, (1, 1, 1), (1, 1, 1), (0, 0, 0),
                     relu=False, dtype=self.dtype, name='conv3')(out,
                                                                 train)
        if self.downsample:
            residual = ConvBN(self.planes * 4, (1, 1, 1),
                              (self.temporal_stride,
                               self.spatial_stride, self.spatial_stride),
                              (0, 0, 0), relu=False, dtype=self.dtype,
                              name='downsample')(x, train)
        return nn.relu(out + residual)


@BACKBONES.register_module()
class ResNet3dLayer(nn.Module):
    """One standalone ResNet3d stage (reference resnet3d.py
    ResNet3dLayer: a single res layer used as an AVA roi-head shared
    backbone extension, no stem)."""
    depth: int = 50
    pretrained: Any = None
    pretrained2d: bool = True
    stage: int = 3
    base_channels: int = 64
    spatial_stride: int = 2
    temporal_stride: int = 1
    dilation: int = 1
    style: str = 'pytorch'
    all_frozen: bool = False
    inflate: int = 1
    inflate_style: str = '3x1x1'
    norm_eval: bool = False
    with_cp: bool = False
    zero_init_residual: bool = True
    conv_cfg: Any = None
    norm_cfg: Any = None
    act_cfg: Any = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert 0 <= self.stage <= 3
        block_type, default_blocks = ARCH_SETTINGS[self.depth]
        block_cls = BasicBlock3d if block_type == 'basic' else \
            Bottleneck3d
        expansion = 1 if block_type == 'basic' else 4
        num_blocks = default_blocks[self.stage]
        planes = self.base_channels * (2 ** self.stage)
        in_planes = x.shape[-1]
        train = train and not self.all_frozen
        for b in range(num_blocks):
            need_ds = (b == 0) and (
                self.spatial_stride != 1 or self.temporal_stride != 1 or
                in_planes != planes * expansion)
            x = block_cls(
                planes,
                spatial_stride=self.spatial_stride if b == 0 else 1,
                temporal_stride=self.temporal_stride if b == 0 else 1,
                dilation=self.dilation,
                inflate=bool(self.inflate),
                downsample=need_ds, dtype=self.dtype,
                name=f'layer{self.stage + 1}_{b}')(x, train)
            in_planes = planes * expansion
        if self.all_frozen:
            x = jax.lax.stop_gradient(x)
        return x


@BACKBONES.register_module()
class ResNet3dSlowOnly_TwoR5(ResNet3d):
    """SlowOnly with a duplicated final stage: the last res layer runs
    twice with independent weights, producing (global, local) features
    for the TwoR5 MoCo necks (reference resnet3d_slowonly.py:56-123)."""
    conv1_kernel: Sequence[int] = (1, 7, 7)
    conv1_stride_t: int = 1
    pool1_stride_t: int = 1
    inflate: Any = (0, 0, 1, 1)
    with_pool2: bool = False
    lateral: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False, laterals=None):
        assert not self.lateral
        block_type, default_blocks = ARCH_SETTINGS[self.depth]
        stage_blocks = self.stage_blocks or \
            default_blocks[:self.num_stages]
        block_cls = BasicBlock3d if block_type == 'basic' else \
            Bottleneck3d
        expansion = 1 if block_type == 'basic' else 4
        inflations = self._stage_inflations()

        k = tuple(self.conv1_kernel)
        x = ConvBN(self.base_channels, k,
                   (self.conv1_stride_t, self.conv1_stride_s,
                    self.conv1_stride_s),
                   tuple((kk - 1) // 2 for kk in k),
                   dtype=self.dtype, name='conv1')(x, train)
        if self.with_pool1:
            x = _max_pool3d(x, (1, 3, 3),
                            (self.pool1_stride_t, self.pool1_stride_s,
                             self.pool1_stride_s), (0, 1, 1))

        def run_stage(x, i, suffix=''):
            planes = self.base_channels * (2 ** i)
            ss, ts = self.spatial_strides[i], self.temporal_strides[i]
            in_planes = x.shape[-1]
            for b in range(stage_blocks[i]):
                need_ds = (b == 0) and (
                    ss != 1 or ts != 1 or
                    in_planes != planes * expansion)
                x = block_cls(
                    planes,
                    spatial_stride=ss if b == 0 else 1,
                    temporal_stride=ts if b == 0 else 1,
                    dilation=self.dilations[i],
                    inflate=bool(inflations[i]),
                    downsample=need_ds, dtype=self.dtype,
                    name=f'layer{i + 1}_{b}{suffix}')(x, train)
                in_planes = planes * expansion
            return x

        outs = []
        last = len(stage_blocks) - 1
        for i in range(last):
            x = run_stage(x, i)
            if i == 0 and self.with_pool2:
                x = _max_pool3d(x, (2, 1, 1), (2, 1, 1), (0, 0, 0))
            if i in self.out_indices:
                outs.append(x)
        x_g = run_stage(x, last)
        x_l = run_stage(x, last, suffix='_local')
        if last in self.out_indices:
            outs.append((x_g, x_l))
        if len(outs) == 1:
            return outs[0]
        return tuple(outs)
