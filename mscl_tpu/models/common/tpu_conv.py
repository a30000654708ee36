"""nn.Conv drop-in that routes 3D convs through ops.conv3d.

The backbone convs go through ``ops.conv3d`` (tap2d/xla3d dispatch +
the 'gidot' grad-input kernel-layout fix — docs/benchmark.md round-3
dossier), but neck/head modules built on flax ``nn.Conv`` lower to raw
``lax.conv_general_dilated``: their grad-input convs keep the folded
flip/transpose kernel layout that knocks XLA onto the slow
EmitOutputBatchInSublanes emitter (measured ~2x on the layer1 class).
``TpuConv`` keeps nn.Conv's exact parameter tree ('kernel'
(kt, kh, kw, C, F), 'bias' (F,)) and init/dtype semantics so checkpoints
and torch-parity tests are unchanged, while the compute path gets the
same treatment as the backbones.

Supported surface (what the necks use): 3D NTHWC, groups=1,
dilation=1, 'SAME'/int/symmetric-pair padding. Anything else should
stay on nn.Conv at the call site.

Parity: reference necks build on mmcv ConvModule(conv_cfg=Conv3d)
(e.g. mmaction/models/necks/sepc.py:57-135, fpn.py:11-227).
"""
from __future__ import annotations

import os
from typing import Any, Sequence, Tuple, Union

import jax.numpy as jnp
from flax import linen as nn

from ...ops.conv3d import conv3d

# Neck-wide rollout switch (VERDICT r3 #3): =1 routes every eligible
# neck conv (FPN laterals/fpn convs, SEPC PConv) through TpuConv; =0
# reverts the whole family to flax nn.Conv for on-chip A/B.
_NECK_TPUCONV = os.environ.get('MSCL_NECK_TPUCONV', '1') == '1'


def set_neck_tpuconv(on: bool) -> None:
    global _NECK_TPUCONV
    _NECK_TPUCONV = bool(on)


class TpuConv(nn.Module):
    """RESTRICTION (ADVICE r3): 'SAME' is only accepted for stride-1
    odd-kernel convs (where it equals symmetric k//2 padding — the only
    form the necks use); a strided-'SAME' call site raises AssertionError
    instead of silently diverging from nn.Conv's per-dim lo/hi split.
    Pass an explicit per-dim padding (or use ``neck_conv``, whose
    eligibility gate routes such sites back to nn.Conv)."""
    features: int
    kernel_size: Tuple[int, int, int]
    strides: Tuple[int, int, int] = (1, 1, 1)
    padding: Union[str, int, Sequence] = 'SAME'
    use_bias: bool = True
    kernel_init: Any = nn.initializers.lecun_normal()
    bias_init: Any = nn.initializers.zeros
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        ks = tuple(self.kernel_size)
        kernel = self.param('kernel', self.kernel_init,
                            ks + (x.shape[-1], self.features),
                            jnp.float32)
        bias = self.param('bias', self.bias_init, (self.features,),
                          jnp.float32) if self.use_bias else None
        if self.dtype is not None:
            x = x.astype(self.dtype)
            kernel = kernel.astype(self.dtype)
            if bias is not None:
                bias = bias.astype(self.dtype)
        pad = self.padding
        if isinstance(pad, str):
            assert pad == 'SAME' and all(k % 2 == 1 for k in ks) and \
                tuple(self.strides) == (1, 1, 1), (pad, ks, self.strides)
            pad = tuple(k // 2 for k in ks)
        elif isinstance(pad, int):
            pad = (pad,) * 3
        else:
            norm = []
            for p in pad:
                if isinstance(p, (tuple, list)):
                    assert p[0] == p[1], p
                    norm.append(p[0])
                else:
                    norm.append(p)
            pad = tuple(norm)
        out = conv3d(x, kernel, tuple(self.strides), pad)
        if bias is not None:
            out = out + bias
        return out


def neck_conv(features: int, kernel_size, *, strides=(1, 1, 1),
              padding='SAME', use_bias: bool = True,
              kernel_init=nn.initializers.lecun_normal(),
              bias_init=nn.initializers.zeros, dtype=None,
              feature_group_count: int = 1,
              kernel_dilation=(1, 1, 1), name=None):
    """nn.Conv/TpuConv dispatch for neck call sites.

    Same parameter tree either way ('kernel' (kt,kh,kw,C,F) + 'bias');
    grouped or dilated convs always stay on nn.Conv (outside TpuConv's
    supported surface). Flip with MSCL_NECK_TPUCONV / set_neck_tpuconv.
    """
    ks = tuple(kernel_size)
    # ADVICE r4: asymmetric per-dim pairs are outside TpuConv's surface
    # (its normalization asserts p[0]==p[1]) — route them to nn.Conv.
    if isinstance(padding, str):
        # Only 'SAME' (stride-1, odd kernel — where it equals symmetric
        # k//2 pads) is inside TpuConv's surface; 'VALID' etc. stay on
        # nn.Conv.
        pad_ok = (padding == 'SAME' and tuple(strides) == (1, 1, 1) and
                  all(k % 2 == 1 for k in ks))
    else:
        pad_ok = (isinstance(padding, int) or
                  all((not isinstance(p, (tuple, list))) or p[0] == p[1]
                      for p in padding))
    eligible = (feature_group_count == 1 and
                tuple(kernel_dilation) == (1, 1, 1) and pad_ok)
    if _NECK_TPUCONV and eligible:
        return TpuConv(features, ks, strides=tuple(strides),
                       padding=padding, use_bias=use_bias,
                       kernel_init=kernel_init, bias_init=bias_init,
                       dtype=dtype, name=name)
    pad = padding
    if isinstance(pad, int):
        pad = [(pad, pad)] * 3
    elif not isinstance(pad, str):
        pad = [(p, p) if not isinstance(p, (tuple, list)) else tuple(p)
               for p in pad]
    return nn.Conv(features, ks, strides=tuple(strides), padding=pad,
                   use_bias=use_bias, kernel_init=kernel_init,
                   bias_init=bias_init, dtype=dtype,
                   feature_group_count=feature_group_count,
                   kernel_dilation=tuple(kernel_dilation), name=name)
