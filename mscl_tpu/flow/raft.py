"""RAFT optical flow in flax (NHWC, jit-able, lax.scan refinement loop).

Parity: reference tools/RAFT/core/ (vendored official RAFT) —
  - BasicEncoder / SmallEncoder      extractor.py:118-270 (7x7 s2 stem,
    3 stages of 2 residual blocks at 64/96/128, 1x1 output conv; instance
    norm for fnet, batch norm for cnet)
  - CorrBlock                        corr.py:12-60 — all-pairs correlation
    (b, h, w, h, w)/sqrt(d), 4-level avg-pooled pyramid, (2r+1)^2 bilinear
    window lookup per pixel. This is the pure-XLA path (the reference's
    own default — alternate_corr=False, raft.py:44-45); the fused Pallas
    lookup kernel lives in mscl_tpu/ops/corr_lookup.py.
  - BasicUpdateBlock (SepConvGRU + motion encoder + flow head + convex
    upsample mask)                   update.py
  - RAFT.forward                     raft.py:86-140 — 12 GRU iterations,
    convex upsampling; iterations run under lax.scan (one compiled body).

Weights: train from scratch or convert the official torch checkpoint with
``load_torch_raft_weights`` (zero-egress environments supply the .pth).
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

conv_init = nn.initializers.variance_scaling(2.0, 'fan_out', 'normal')


def instance_norm(x, eps=1e-5):
    """InstanceNorm2d(affine=False) over NHWC."""
    mean = x.mean(axis=(1, 2), keepdims=True)
    var = x.var(axis=(1, 2), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


class _Norm(nn.Module):
    norm_fn: str = 'instance'
    num_groups: int = 8

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.norm_fn == 'instance':
            return instance_norm(x)
        if self.norm_fn == 'batch':
            return nn.BatchNorm(use_running_average=not train,
                                momentum=0.9, epsilon=1e-5,
                                dtype=jnp.float32, name='bn')(x)
        if self.norm_fn == 'group':
            return nn.GroupNorm(num_groups=self.num_groups,
                                name='gn')(x)
        if self.norm_fn == 'none':
            return x
        raise ValueError(self.norm_fn)


class ResidualBlock(nn.Module):
    planes: int
    norm_fn: str = 'instance'
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nn.Conv(self.planes, (3, 3), strides=(self.stride,) * 2,
                    padding=[(1, 1), (1, 1)], kernel_init=conv_init,
                    dtype=self.dtype, name='conv1')(x)
        y = _Norm(self.norm_fn, name='norm1')(y, train)
        y = nn.relu(y)
        y = nn.Conv(self.planes, (3, 3), padding=[(1, 1), (1, 1)],
                    kernel_init=conv_init, dtype=self.dtype,
                    name='conv2')(y)
        y = _Norm(self.norm_fn, name='norm2')(y, train)
        y = nn.relu(y)
        if self.stride != 1 or x.shape[-1] != self.planes:
            x = nn.Conv(self.planes, (1, 1), strides=(self.stride,) * 2,
                        kernel_init=conv_init, dtype=self.dtype,
                        name='downsample')(x)
            x = _Norm(self.norm_fn, name='norm3')(x, train)
        return nn.relu(x + y)


class BasicEncoder(nn.Module):
    output_dim: int = 128
    norm_fn: str = 'batch'
    stage_dims: Sequence[int] = (64, 96, 128)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.stage_dims[0], (7, 7), strides=(2, 2),
                    padding=[(3, 3), (3, 3)], kernel_init=conv_init,
                    dtype=self.dtype, name='conv1')(x)
        x = _Norm(self.norm_fn, name='norm1')(x, train)
        x = nn.relu(x)
        for s, dim in enumerate(self.stage_dims):
            stride = 1 if s == 0 else 2
            x = ResidualBlock(dim, self.norm_fn, stride,
                              dtype=self.dtype,
                              name=f'layer{s + 1}_0')(x, train)
            x = ResidualBlock(dim, self.norm_fn, 1, dtype=self.dtype,
                              name=f'layer{s + 1}_1')(x, train)
        return nn.Conv(self.output_dim, (1, 1), kernel_init=conv_init,
                       dtype=self.dtype, name='conv2')(x)


# ------------------------------------------------------------ correlation
def bilinear_sampler(img: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """grid_sample(align_corners=True, padding=zeros) in pixel coords.

    img: (N, H, W, C); coords: (N, Ho, Wo, 2) as (x, y) pixels.
    """
    h, w = img.shape[1], img.shape[2]
    x, y = coords[..., 0], coords[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    x1, y1 = x0 + 1, y0 + 1
    wx = x - x0
    wy = y - y0

    def gather(ix, iy):
        valid = (ix >= 0) & (ix <= w - 1) & (iy >= 0) & (iy <= h - 1)
        ixc = jnp.clip(ix, 0, w - 1).astype(jnp.int32)
        iyc = jnp.clip(iy, 0, h - 1).astype(jnp.int32)
        flat = img.reshape(img.shape[0], h * w, -1)
        idx = iyc * w + ixc
        vals = jnp.take_along_axis(
            flat, idx.reshape(idx.shape[0], -1, 1), axis=1)
        vals = vals.reshape(idx.shape + (img.shape[-1],))
        return vals * valid[..., None]

    out = (gather(x0, y0) * ((1 - wx) * (1 - wy))[..., None] +
           gather(x1, y0) * (wx * (1 - wy))[..., None] +
           gather(x0, y1) * ((1 - wx) * wy)[..., None] +
           gather(x1, y1) * (wx * wy)[..., None])
    return out


def build_corr_pyramid(fmap1: jnp.ndarray, fmap2: jnp.ndarray,
                       num_levels: int = 4):
    """All-pairs correlation pyramid (reference corr.py:12-27,52-60).
    fmaps: (N, H, W, C). Returns list of (N*H*W, h_l, w_l, 1)."""
    n, h, w, c = fmap1.shape
    f1 = fmap1.reshape(n, h * w, c)
    f2 = fmap2.reshape(n, h * w, c)
    corr = jnp.einsum('nic,njc->nij', f1, f2,
                      preferred_element_type=jnp.float32)
    corr = corr / jnp.sqrt(jnp.float32(c))
    corr = corr.reshape(n * h * w, h, w, 1)
    pyramid = [corr]
    for _ in range(num_levels - 1):
        ch, cw = corr.shape[1] // 2, corr.shape[2] // 2
        corr = corr[:, :ch * 2, :cw * 2].reshape(
            corr.shape[0], ch, 2, cw, 2, 1).mean(axis=(2, 4))
        pyramid.append(corr)
    return pyramid


def lookup_corr(pyramid, coords: jnp.ndarray, radius: int = 4
                ) -> jnp.ndarray:
    """Window lookup at flow hypotheses (reference corr.py:29-50).
    coords: (N, H, W, 2) pixel coords in level-0 resolution.
    Returns (N, H, W, num_levels*(2r+1)^2)."""
    n, h, w, _ = coords.shape
    r = radius
    dx = jnp.arange(-r, r + 1, dtype=jnp.float32)
    delta = jnp.stack(jnp.meshgrid(dx, dx, indexing='ij'),
                      axis=-1)  # (2r+1, 2r+1, 2) as (dy, dx)
    delta = delta[..., ::-1]    # -> (dx, dy) to match (x, y) coords
    out = []
    for i, corr in enumerate(pyramid):
        centroid = coords.reshape(n * h * w, 1, 1, 2) / (2 ** i)
        coords_lvl = centroid + delta[None]
        sampled = bilinear_sampler(corr, coords_lvl)  # (nhw,2r+1,2r+1,1)
        out.append(sampled.reshape(n, h, w, -1))
    return jnp.concatenate(out, axis=-1)


# ---------------------------------------------------------- update block
class FlowHead(nn.Module):
    hidden_dim: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.hidden_dim, (3, 3), padding=[(1, 1), (1, 1)],
                    dtype=self.dtype, name='conv1')(x)
        x = nn.relu(x)
        return nn.Conv(2, (3, 3), padding=[(1, 1), (1, 1)],
                       dtype=self.dtype, name='conv2')(x)


class SepConvGRU(nn.Module):
    hidden_dim: int = 128
    dtype: Any = jnp.float32

    def _gru(self, h, x, kernel, pad, suffix):
        hx = jnp.concatenate([h, x], axis=-1)
        z = jax.nn.sigmoid(nn.Conv(self.hidden_dim, kernel, padding=pad,
                                   dtype=self.dtype,
                                   name=f'convz{suffix}')(hx))
        r = jax.nn.sigmoid(nn.Conv(self.hidden_dim, kernel, padding=pad,
                                   dtype=self.dtype,
                                   name=f'convr{suffix}')(hx))
        q = jnp.tanh(nn.Conv(self.hidden_dim, kernel, padding=pad,
                             dtype=self.dtype, name=f'convq{suffix}')(
            jnp.concatenate([r * h, x], axis=-1)))
        return (1 - z) * h + z * q

    @nn.compact
    def __call__(self, h, x):
        h = self._gru(h, x, (1, 5), [(0, 0), (2, 2)], '1')  # horizontal
        h = self._gru(h, x, (5, 1), [(2, 2), (0, 0)], '2')  # vertical
        return h


class BasicMotionEncoder(nn.Module):
    corr_levels: int = 4
    corr_radius: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, flow, corr):
        cor = nn.relu(nn.Conv(256, (1, 1), dtype=self.dtype,
                              name='convc1')(corr))
        cor = nn.relu(nn.Conv(192, (3, 3), padding=[(1, 1), (1, 1)],
                              dtype=self.dtype, name='convc2')(cor))
        flo = nn.relu(nn.Conv(128, (7, 7), padding=[(3, 3), (3, 3)],
                              dtype=self.dtype, name='convf1')(flow))
        flo = nn.relu(nn.Conv(64, (3, 3), padding=[(1, 1), (1, 1)],
                              dtype=self.dtype, name='convf2')(flo))
        out = nn.relu(nn.Conv(126, (3, 3), padding=[(1, 1), (1, 1)],
                              dtype=self.dtype, name='conv')(
            jnp.concatenate([cor, flo], axis=-1)))
        return jnp.concatenate([out, flow], axis=-1)


class BasicUpdateBlock(nn.Module):
    hidden_dim: int = 128
    corr_levels: int = 4
    corr_radius: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, net, inp, corr, flow):
        motion = BasicMotionEncoder(self.corr_levels, self.corr_radius,
                                    dtype=self.dtype,
                                    name='encoder')(flow, corr)
        inp = jnp.concatenate([inp, motion], axis=-1)
        net = SepConvGRU(self.hidden_dim, dtype=self.dtype,
                         name='gru')(net, inp)
        delta_flow = FlowHead(256, dtype=self.dtype,
                              name='flow_head')(net)
        mask = nn.Conv(256, (3, 3), padding=[(1, 1), (1, 1)],
                       dtype=self.dtype, name='mask_conv1')(net)
        mask = nn.relu(mask)
        mask = nn.Conv(64 * 9, (1, 1), dtype=self.dtype,
                       name='mask_conv2')(mask)
        return net, 0.25 * mask, delta_flow


def coords_grid(n, h, w):
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32),
                          indexing='ij')
    grid = jnp.stack([xs, ys], axis=-1)  # (h, w, 2) as (x, y)
    return jnp.broadcast_to(grid[None], (n, h, w, 2))


def upsample_flow_convex(flow, mask):
    """Convex-combination 8x upsampling (reference raft.py:72-84).
    flow: (N, H, W, 2); mask: (N, H, W, 64*9)."""
    n, h, w, _ = flow.shape
    mask = mask.reshape(n, h, w, 9, 8, 8)
    mask = jax.nn.softmax(mask, axis=3)
    # 3x3 neighborhoods of 8*flow: (N, H, W, 9, 2)
    padded = jnp.pad(8 * flow, ((0, 0), (1, 1), (1, 1), (0, 0)))
    neigh = jnp.stack([
        padded[:, dy:dy + h, dx:dx + w] for dy in range(3)
        for dx in range(3)], axis=3)
    up = (mask[..., None] * neigh[:, :, :, :, None, None, :]).sum(axis=3)
    # (N, H, W, 8, 8, 2) -> (N, 8H, 8W, 2)
    up = up.transpose(0, 1, 3, 2, 4, 5).reshape(n, 8 * h, 8 * w, 2)
    return up


class RAFT(nn.Module):
    """RAFT (large). Input images NHWC uint8/float in [0, 255]; output
    flow (N, H, W, 2)."""
    hidden_dim: int = 128
    context_dim: int = 128
    corr_levels: int = 4
    corr_radius: int = 4
    iters: int = 12
    # 'volume' materializes the all-pairs pyramid (reference default,
    # corr.py alternate_corr=False); 'pallas' / 'scan' are the
    # memory-efficient alt_cuda_corr equivalents (ops/corr_lookup.py)
    # that recompute one slab per pixel tile at every lookup.
    # 'auto': the soft-one-hot Pallas kernel (corr_lookup_pallas_v2,
    # 4.77 ms/lookup at RAFT 440x1024 vs 478 ms for the volume on v5e)
    # on TPU, the volume path elsewhere.
    corr_impl: str = 'auto'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, image1, image2, iters: Optional[int] = None,
                 train: bool = False):
        iters = iters or self.iters
        hdim, cdim = self.hidden_dim, self.context_dim
        image1 = 2 * (image1 / 255.0) - 1.0
        image2 = 2 * (image2 / 255.0) - 1.0

        fnet = BasicEncoder(256, 'instance', dtype=self.dtype,
                            name='fnet')
        both = fnet(jnp.concatenate([image1, image2], axis=0), train)
        fmap1, fmap2 = jnp.split(both, 2, axis=0)
        fmap1 = fmap1.astype(jnp.float32)
        fmap2 = fmap2.astype(jnp.float32)
        corr_impl = self.corr_impl
        if corr_impl == 'auto':
            corr_impl = 'pallas' if any(
                d.platform == 'tpu' for d in jax.devices()) else 'volume'
        if corr_impl == 'volume':
            pyramid = build_corr_pyramid(fmap1, fmap2, self.corr_levels)
            corr_fn = lambda coords: lookup_corr(   # noqa: E731
                pyramid, coords, self.corr_radius)
        else:
            from ..ops.corr_lookup import (corr_lookup_pallas_v2,
                                           corr_lookup_scan)
            fn = corr_lookup_pallas_v2 if corr_impl == 'pallas' \
                else corr_lookup_scan
            corr_fn = lambda coords: fn(            # noqa: E731
                fmap1, fmap2, coords, self.corr_levels,
                self.corr_radius)

        cnet = BasicEncoder(hdim + cdim, 'batch', dtype=self.dtype,
                            name='cnet')(image1, train)
        net, inp = jnp.split(cnet, [hdim], axis=-1)
        net = jnp.tanh(net)
        inp = nn.relu(inp)

        n, h8, w8 = fmap1.shape[0], fmap1.shape[1], fmap1.shape[2]
        coords0 = coords_grid(n, h8, w8)
        coords1 = coords_grid(n, h8, w8)

        update = BasicUpdateBlock(hdim, self.corr_levels,
                                  self.corr_radius, dtype=self.dtype,
                                  name='update_block')

        def body(carry, _):
            net, coords1 = carry
            coords1 = jax.lax.stop_gradient(coords1)
            corr = corr_fn(coords1)
            flow = coords1 - coords0
            net, up_mask, delta_flow = update(net, inp, corr, flow)
            coords1 = coords1 + delta_flow
            return (net, coords1), up_mask

        # 12 refinement iterations (reference raft.py:122-140); the loop
        # shares params through flax's compact-call caching
        (net, coords1), up_masks = self._scan_loop(body, (net, coords1),
                                                   iters)

        flow_up = upsample_flow_convex(coords1 - coords0, up_masks)
        return coords1 - coords0, flow_up

    def _scan_loop(self, body, carry, iters):
        # plain python loop: params are shared via compact-call caching;
        # XLA still sees one unrolled graph (12 iterations)
        up_mask = None
        for _ in range(iters):
            carry, up_mask = body(carry, None)
        return carry, up_mask


def load_torch_raft_weights(pth_path: str) -> dict:
    """Convert an official RAFT torch checkpoint (raft-things.pth etc.)
    into this module's param pytree. Requires torch for unpickling."""
    import torch
    sd = torch.load(pth_path, map_location='cpu')
    sd = {k.replace('module.', ''): v.numpy() for k, v in sd.items()}

    params: dict = {}
    bstats: dict = {}

    def put(tree, path, value):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = jnp.asarray(value)

    def conv_w(v):   # OIHW -> HWIO
        return np.transpose(v, (2, 3, 1, 0))

    for k, v in sd.items():
        parts = k.split('.')
        mod = parts[0]  # fnet / cnet / update_block
        rest = parts[1:]

        def seq_block(enc_name):
            # extractor naming: conv1/norm1/layerX.Y.convZ/normZ/
            # downsample.{0,1}/conv2
            name = rest[0]
            if name in ('conv1', 'conv2'):
                if rest[-1] == 'weight' and v.ndim == 4:
                    put(params, (mod, name, 'kernel'), conv_w(v))
                elif rest[-1] == 'bias':
                    put(params, (mod, name, 'bias'), v)
            elif name == 'norm1':
                _norm_param((mod, 'norm1'), rest[-1], v)
            elif name.startswith('layer'):
                stage = name  # layer1..layer3
                blk = rest[1]
                sub = rest[2]
                flax_blk = f'{stage}_{blk}'
                if sub in ('conv1', 'conv2'):
                    if rest[-1] == 'weight':
                        put(params, (mod, flax_blk, sub, 'kernel'),
                            conv_w(v))
                    else:
                        put(params, (mod, flax_blk, sub, 'bias'), v)
                elif sub in ('norm1', 'norm2', 'norm3'):
                    _norm_param((mod, flax_blk, sub), rest[-1], v)
                elif sub == 'downsample':
                    idx = rest[3]
                    if idx == '0':  # conv
                        if rest[-1] == 'weight':
                            put(params, (mod, flax_blk, 'downsample',
                                         'kernel'), conv_w(v))
                        else:
                            put(params, (mod, flax_blk, 'downsample',
                                         'bias'), v)
                    else:  # norm
                        _norm_param((mod, flax_blk, 'norm3'),
                                    rest[-1], v)

        def _norm_param(prefix, leaf, v):
            if leaf == 'weight':
                put(params, prefix + ('bn', 'scale'), v)
            elif leaf == 'bias':
                put(params, prefix + ('bn', 'bias'), v)
            elif leaf == 'running_mean':
                put(bstats, prefix + ('bn', 'mean'), v)
            elif leaf == 'running_var':
                put(bstats, prefix + ('bn', 'var'), v)

        if mod in ('fnet', 'cnet'):
            seq_block(mod)
        elif mod == 'update_block':
            sub = rest[0]
            if sub == 'encoder':
                cname = rest[1]
                if rest[-1] == 'weight':
                    put(params, (mod, 'encoder', cname, 'kernel'),
                        conv_w(v))
                else:
                    put(params, (mod, 'encoder', cname, 'bias'), v)
            elif sub == 'gru':
                cname = rest[1]  # convz1 etc.
                if rest[-1] == 'weight':
                    put(params, (mod, 'gru', cname, 'kernel'), conv_w(v))
                else:
                    put(params, (mod, 'gru', cname, 'bias'), v)
            elif sub == 'flow_head':
                cname = rest[1]
                if rest[-1] == 'weight':
                    put(params, (mod, 'flow_head', cname, 'kernel'),
                        conv_w(v))
                else:
                    put(params, (mod, 'flow_head', cname, 'bias'), v)
            elif sub == 'mask':
                idx = rest[1]
                cname = 'mask_conv1' if idx == '0' else 'mask_conv2'
                if rest[-1] == 'weight':
                    put(params, (mod, cname, 'kernel'), conv_w(v))
                else:
                    put(params, (mod, cname, 'bias'), v)

    return {'params': params, 'batch_stats': bstats}
