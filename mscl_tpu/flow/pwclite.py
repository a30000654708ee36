"""PWC-Lite (ARFlow) — lightweight unsupervised optical flow.

Parity: reference tools/ARFlow/models/pwclite.py:9-282 and
tools/ARFlow/flow_utils.py:498-527 —
  - FeatureExtractor: 6-level stride-2 pyramid, chs 3/16/32/64/96/128/192
  - cost volume: +-4 displacement patch correlation, channel mean
    (the CUDA correlation_package / correlation_native.py semantics),
    LeakyReLU(0.1)
  - FlowEstimatorDense (DenseNet-style) / FlowEstimatorReduce
  - ContextNetwork: dilated conv refinement (dilations 1,2,4,8,16,1)
  - coarse-to-fine over 5 levels (output_level=4) with bilinear
    flow upsampling (x2, align_corners=True) and border-padded warping
  - 2-frame and 3-frame (fw/bw fused) modes

TPU design: NHWC throughout; the cost volume is 81 statically-shifted
channel-mean products (XLA fuses the stack — no correlation CUDA op);
warping is a clamped (border) bilinear gather.
"""
from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

conv_init = nn.initializers.variance_scaling(2.0, 'fan_out', 'normal')


class ConvLReLU(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    dilation: int = 1
    relu: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        pad = ((self.kernel - 1) * self.dilation) // 2
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=[(pad, pad)] * 2,
                    kernel_dilation=(self.dilation, self.dilation),
                    use_bias=True, kernel_init=conv_init,
                    dtype=self.dtype, name='conv')(x)
        return nn.leaky_relu(x, 0.1) if self.relu else x


class FeatureExtractor(nn.Module):
    num_chs: Sequence[int] = (3, 16, 32, 64, 96, 128, 192)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        pyramid = []
        for i, ch in enumerate(self.num_chs[1:]):
            x = ConvLReLU(ch, stride=2, dtype=self.dtype,
                          name=f'level{i}_conv1')(x)
            x = ConvLReLU(ch, dtype=self.dtype,
                          name=f'level{i}_conv2')(x)
            pyramid.append(x)
        return pyramid[::-1]


def cost_volume(x1: jnp.ndarray, x2: jnp.ndarray, radius: int = 4
                ) -> jnp.ndarray:
    """(N, H, W, C) x2 -> (N, H, W, (2r+1)^2) channel-mean correlation
    (reference correlation_native.py:6-24; row-major (dy, dx) order)."""
    n, h, w, c = x1.shape
    r = radius
    x2p = jnp.pad(x2, ((0, 0), (r, r), (r, r), (0, 0)))
    out = []
    for dy in range(2 * r + 1):
        for dx in range(2 * r + 1):
            shifted = jax.lax.slice(
                x2p, (0, dy, dx, 0), (n, dy + h, dx + w, c))
            out.append((x1 * shifted).mean(axis=-1))
    return jnp.stack(out, axis=-1)


def flow_warp(x: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """Warp x by flow with border padding (reference flow_utils.py:
    498-527 grid_sample(mode=bilinear, padding=border,
    align_corners=True)). x (N, H, W, C), flow (N, H, W, 2) as (u, v)."""
    n, h, w, _ = x.shape
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=flow.dtype),
                          jnp.arange(w, dtype=flow.dtype), indexing='ij')
    cx = jnp.clip(xs[None] + flow[..., 0], 0, w - 1)
    cy = jnp.clip(ys[None] + flow[..., 1], 0, h - 1)
    x0 = jnp.floor(cx)
    y0 = jnp.floor(cy)
    fx = (cx - x0)[..., None]
    fy = (cy - y0)[..., None]

    def gather(ix, iy):
        ix = jnp.clip(ix, 0, w - 1).astype(jnp.int32)
        iy = jnp.clip(iy, 0, h - 1).astype(jnp.int32)
        flat = x.reshape(n, h * w, -1)
        idx = (iy * w + ix).reshape(n, -1, 1)
        return jnp.take_along_axis(flat, idx, axis=1).reshape(x.shape)

    return (gather(x0, y0) * (1 - fx) * (1 - fy) +
            gather(x0 + 1, y0) * fx * (1 - fy) +
            gather(x0, y0 + 1) * (1 - fx) * fy +
            gather(x0 + 1, y0 + 1) * fx * fy)


def upsample2x_align(x: jnp.ndarray) -> jnp.ndarray:
    """Bilinear x2 upsample with align_corners=True semantics."""
    n, h, w, c = x.shape
    return _resize_align(x, 2 * h, 2 * w)


def _resize_align(x, ho, wo):
    n, h, w, c = x.shape
    sy = (h - 1) / max(ho - 1, 1)
    sx = (w - 1) / max(wo - 1, 1)
    ys = jnp.arange(ho, dtype=jnp.float32) * sy
    xs = jnp.arange(wo, dtype=jnp.float32) * sx
    y0 = jnp.clip(jnp.floor(ys), 0, h - 1).astype(jnp.int32)
    x0 = jnp.clip(jnp.floor(xs), 0, w - 1).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    fy = (ys - y0)[None, :, None, None]
    fx = (xs - x0)[None, None, :, None]
    a = x[:, y0][:, :, x0]
    b = x[:, y0][:, :, x1]
    cbl = x[:, y1][:, :, x0]
    d = x[:, y1][:, :, x1]
    return (a * (1 - fy) * (1 - fx) + b * (1 - fy) * fx +
            cbl * fy * (1 - fx) + d * fy * fx)


class FlowEstimatorDense(nn.Module):
    dtype: Any = jnp.float32
    feat_dim_extra: int = 448     # ch_in + 448 features out

    @nn.compact
    def __call__(self, x):
        for i, ch in enumerate((128, 128, 96, 64, 32)):
            y = ConvLReLU(ch, dtype=self.dtype, name=f'conv{i + 1}')(x)
            x = jnp.concatenate([y, x], axis=-1)
        flow = ConvLReLU(2, relu=False, dtype=self.dtype,
                         name='conv_last')(x)
        return x, flow


class FlowEstimatorReduce(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x1 = ConvLReLU(128, dtype=self.dtype, name='conv1')(x)
        x2 = ConvLReLU(128, dtype=self.dtype, name='conv2')(x1)
        x3 = ConvLReLU(96, dtype=self.dtype, name='conv3')(
            jnp.concatenate([x1, x2], axis=-1))
        x4 = ConvLReLU(64, dtype=self.dtype, name='conv4')(
            jnp.concatenate([x2, x3], axis=-1))
        x5 = ConvLReLU(32, dtype=self.dtype, name='conv5')(
            jnp.concatenate([x3, x4], axis=-1))
        flow = ConvLReLU(2, relu=False, dtype=self.dtype,
                         name='predict_flow')(
            jnp.concatenate([x4, x5], axis=-1))
        return x5, flow


class ContextNetwork(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i, (ch, dil) in enumerate(((128, 1), (128, 2), (128, 4),
                                       (96, 8), (64, 16), (32, 1))):
            x = ConvLReLU(ch, dilation=dil, dtype=self.dtype,
                          name=f'conv{i + 1}')(x)
        return ConvLReLU(2, relu=False, dtype=self.dtype,
                         name='conv_out')(x)


class PWCLite(nn.Module):
    """reference pwclite.py:108-282. Input x: (N, n_frames*3, H, W)
    NCHW (reference convention) or (N, n_frames, H, W, 3)."""
    n_frames: int = 2
    reduce_dense: bool = True
    upsample: bool = True
    search_range: int = 4
    output_level: int = 4
    dtype: Any = jnp.float32

    def setup(self):
        self.extractor = FeatureExtractor(dtype=self.dtype)
        est = FlowEstimatorReduce if self.reduce_dense else \
            FlowEstimatorDense
        self.flow_estimator = est(dtype=self.dtype)
        self.context_net = ContextNetwork(dtype=self.dtype)
        self.conv_1x1 = [ConvLReLU(32, kernel=1, dtype=self.dtype,
                                   name=f'conv_1x1_{i}')
                         for i in range(5)]

    def _two_frames(self, p1, p2):
        flows = []
        flow = jnp.zeros(p1[0].shape[:3] + (2,), jnp.float32)
        for level, (x1, x2) in enumerate(zip(p1, p2)):
            if level > 0:
                flow = upsample2x_align(flow * 2.0)
                x2_warp = flow_warp(x2, flow)
            else:
                x2_warp = x2
            corr = nn.leaky_relu(
                cost_volume(x1, x2_warp, self.search_range), 0.1)
            x1_1by1 = self.conv_1x1[level](x1)
            x_intm, flow_res = self.flow_estimator(
                jnp.concatenate([corr, x1_1by1, flow], axis=-1))
            flow = flow + flow_res
            flow_fine = self.context_net(
                jnp.concatenate([x_intm, flow], axis=-1))
            flow = flow + flow_fine
            flows.append(flow)
            if level == self.output_level:
                break
        if self.upsample:
            flows = [_resize_align(f * 4.0, f.shape[1] * 4,
                                   f.shape[2] * 4) for f in flows]
        return flows[::-1]

    def _three_frames(self, p0, p1, p2):
        flows = []
        flow = jnp.zeros(p1[0].shape[:3] + (4,), jnp.float32)
        for level, (x0, x1, x2) in enumerate(zip(p0, p1, p2)):
            if level > 0:
                flow = upsample2x_align(flow * 2.0)
                x0_warp = flow_warp(x0, flow[..., :2])
                x2_warp = flow_warp(x2, flow[..., 2:])
            else:
                x0_warp, x2_warp = x0, x2
            c10 = nn.leaky_relu(
                cost_volume(x1, x0_warp, self.search_range), 0.1)
            c12 = nn.leaky_relu(
                cost_volume(x1, x2_warp, self.search_range), 0.1)
            x1_1by1 = self.conv_1x1[level](x1)
            f10 = jnp.concatenate(
                [x1_1by1, c10, c12, flow[..., :2], -flow[..., 2:]], -1)
            f12 = jnp.concatenate(
                [x1_1by1, c12, c10, flow[..., 2:], -flow[..., :2]], -1)
            i10, r10 = self.flow_estimator(f10)
            i12, r12 = self.flow_estimator(f12)
            flow = flow + jnp.concatenate([r10, r12], axis=-1)
            g10 = self.context_net(jnp.concatenate(
                [i10, i12, flow[..., :2], -flow[..., 2:]], -1))
            g12 = self.context_net(jnp.concatenate(
                [i12, i10, flow[..., 2:], -flow[..., :2]], -1))
            flow = flow + jnp.concatenate([g10, g12], axis=-1)
            flows.append(flow)
            if level == self.output_level:
                break
        if self.upsample:
            flows = [_resize_align(f * 4.0, f.shape[1] * 4,
                                   f.shape[2] * 4) for f in flows]
        flows = flows[::-1]
        return ([f[..., :2] for f in flows],
                [f[..., 2:] for f in flows])

    def __call__(self, x, with_bk: bool = False):
        if x.ndim == 4:   # (N, n*3, H, W) NCHW reference layout
            n_frames = x.shape[1] // 3
            imgs = [jnp.transpose(x[:, 3 * i:3 * i + 3], (0, 2, 3, 1))
                    for i in range(n_frames)]
        else:             # (N, n_frames, H, W, 3)
            n_frames = x.shape[1]
            imgs = [x[:, i] for i in range(n_frames)]
        pyramids = [self.extractor(im) for im in imgs]

        if n_frames == 2:
            res = dict(flows_fw=self._two_frames(*pyramids))
            if with_bk:
                res['flows_bw'] = self._two_frames(pyramids[1],
                                                   pyramids[0])
            return res
        if n_frames == 3:
            flows_10, flows_12 = self._three_frames(*pyramids)
            return dict(flows_fw=flows_12, flows_bw=flows_10)
        raise NotImplementedError(f'n_frames={n_frames}')
