"""3D-capable Feature Pyramid Network in flax (NTHWC).

Parity: reference mmaction/models/necks/fpn.py:11-227 (mmdet-style FPN with
conv_cfg=Conv3d, fpn kernel (1,3,3)): lateral 1x1x1 convs, top-down
nearest-upsample sum, per-level fpn convs. Torch's nearest interpolation
(src = floor(dst * in/out)) is reproduced exactly via index gathers so
features match the reference for non-integer scale factors.
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..builder import NECKS
from ..common.tpu_conv import neck_conv

xavier_uniform = nn.initializers.xavier_uniform()


def torch_nearest_resize(x: jnp.ndarray, size: Tuple[int, int, int]
                         ) -> jnp.ndarray:
    """Nearest-neighbor resize of NTHWC to (T, H, W) = size using torch's
    F.interpolate(mode='nearest') index rule: src = floor(dst * in / out).

    Exact integer factors take gather-free forms with cheap transposes:
    a jnp.take upsample differentiates to a scatter-add (serialized on
    TPU — 6 x 12.8M-element scatters per step in the FPN top-down path);
    broadcast+reshape differentiates to a fused reduce, and the
    downsample's reshape+unit-slice to a pad. floor(dst*old/new) equals
    dst//r (old*r==new) resp. dst*s (old==new*s), so the fast paths are
    index-rule exact; non-integer ratios keep the take."""
    out = x
    for axis, new in zip((1, 2, 3), size):
        old = out.shape[axis]
        if old == new:
            continue
        if new % old == 0:
            r = new // old
            shp = out.shape
            out = jnp.broadcast_to(
                jnp.expand_dims(out, axis + 1),
                shp[:axis + 1] + (r,) + shp[axis + 1:]).reshape(
                    shp[:axis] + (new,) + shp[axis + 1:])
        elif old % new == 0:
            s = old // new
            shp = out.shape
            out = out.reshape(
                shp[:axis] + (new, s) + shp[axis + 1:])
            out = jax.lax.index_in_dim(out, 0, axis + 1, keepdims=False)
        else:
            idx = jnp.floor(jnp.arange(new) * (old / new)).astype(jnp.int32)
            out = jnp.take(out, idx, axis=axis)
    return out


class FPN(nn.Module):
    in_channels: Sequence[int]
    out_channels: int
    num_outs: int
    fpn_kerne_size: Tuple[int, int, int] = (1, 3, 3)  # reference spelling
    fpn_stride: int = 2
    start_level: int = 0
    end_level: int = -1
    conv_cfg: Any = None      # accepted for config parity; always Conv3d
    norm_cfg: Any = None
    act_cfg: Any = None
    upsample_cfg: Any = None  # always torch-nearest
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        assert len(inputs) == len(self.in_channels)
        ks = self.fpn_kerne_size
        if isinstance(ks, int):
            ks = (ks, ks, ks)
        pad = tuple((k - 1) // 2 for k in ks)
        backbone_end = len(self.in_channels) if self.end_level == -1 \
            else self.end_level
        used = backbone_end - self.start_level

        # laterals: 1x1x1 convs (bias, no norm/act — ConvModule defaults)
        laterals = []
        for i in range(used):
            lat = neck_conv(self.out_channels, (1, 1, 1), use_bias=True,
                            kernel_init=xavier_uniform, dtype=self.dtype,
                            name=f'lateral_{i}')(
                                inputs[i + self.start_level])
            laterals.append(lat)

        # top-down pathway with torch-nearest upsampling
        for i in range(used - 1, 0, -1):
            prev_shape = laterals[i - 1].shape[1:4]
            laterals[i - 1] = laterals[i - 1] + torch_nearest_resize(
                laterals[i], prev_shape)

        # per-level fpn convs
        outs = []
        for i in range(used):
            out = neck_conv(self.out_channels, ks,
                            padding=tuple(pad), use_bias=True,
                            kernel_init=xavier_uniform, dtype=self.dtype,
                            name=f'fpn_{i}')(laterals[i])
            outs.append(out)

        # extra levels via strided max-pool (reference fpn.py:205-210;
        # extra convs are not used by any MSCL config)
        for _ in range(self.num_outs - used):
            outs.append(nn.max_pool(outs[-1], (1, 1, 1),
                                    strides=(2, 2, 2), padding='VALID'))
        return list(outs)


NECKS.register_module(name='FPN', module=FPN)
