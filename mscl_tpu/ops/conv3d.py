"""3D convolution lowered to a single 2D convolution (TPU fast path).

XLA-TPU's 3D convolution path reaches only ~20% MFU on the r3d_18 tower
(docs/benchmark.md round-1 breakdown), while its 2D conv path is the
heavily tuned one. A (kt, kh, kw) conv over (N, T, H, W, C) is exactly a
(kh, kw) conv over (N*T_out, H, W, kt*C) on temporally-stacked input:

    out[n, t, y, x, f] = sum_{dt, dy, dx, c}
        in[n, st*t + dt - pt, ...] * w[dt, dy, dx, c, f]

so we gather the kt temporal taps (cheap strided slices), concatenate
them on the channel axis, and issue ONE 2D conv whose kernel is the 3D
kernel with the temporal axis folded into input channels. FLOPs are
identical; the MXU sees a single large 2D conv.

The parameter keeps the torchvision 3D layout (kt, kh, kw, C, F) so
checkpoints/init are unchanged; only the compute graph differs.

Parity role: this is the TPU-native answer to the reference's cuDNN 3D
convs (torchvision VideoResNet, reference fastonly.py conv makers).
"""
from __future__ import annotations

import os
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

# Global implementation policy:
#   'xla3d' — direct lax 3D conv everywhere
#   'tap2d' — 2D lowering everywhere
#   'auto'  — tap2d where the direct path is measured-pathological
#             (kt == 1: the T axis is trivially batchable; thin input
#             channels: v5e microbench shows the 3-ch stem at 0.1% MFU
#             under xla3d vs 5.2% under tap2d), xla3d otherwise.
# Full-step v5e measurements (MSCL r18, bs32): all-xla3d 94.6 ms/step,
# all-tap2d 172.9 ms/step (tap stacking triples conv input HBM traffic
# on the all-3x3x3 RGB tower).
_IMPL = os.environ.get('MSCL_CONV3D_IMPL', 'xla3d')


def set_conv3d_impl(impl: str) -> None:
    global _IMPL
    assert impl in ('tap2d', 'xla3d', 'auto', 'sumtap'), impl
    _IMPL = impl


def get_conv3d_impl() -> str:
    return _IMPL


def conv3d(x: jnp.ndarray, kernel: jnp.ndarray,
           stride: Tuple[int, int, int],
           padding: Tuple[int, int, int]) -> jnp.ndarray:
    """NTHWC 3D conv with kernel (kt, kh, kw, C, F), symmetric padding."""
    impl = _IMPL
    if impl == 'auto':
        impl = 'tap2d' if (kernel.shape[0] == 1 or
                           kernel.shape[3] < 16) else 'xla3d'
    if impl == 'xla3d':
        return _conv3d_xla(x, kernel, stride, padding)
    if impl == 'sumtap':
        return _conv3d_sumtap(x, kernel, stride, padding)
    return _conv3d_tap2d(x, kernel, stride, padding)


def _conv3d_sumtap(x, kernel, stride, padding):
    """Sum of kt per-tap 2D convs — same FLOPs, no kt*C concat
    materialization (vs tap2d); each tap reads a strided slice of x."""
    kt, kh, kw, c, f = kernel.shape
    st, sh, sw = stride
    pt, ph, pw = padding
    n, t, h, w, _ = x.shape
    if pt:
        x = jnp.pad(x, ((0, 0), (pt, pt), (0, 0), (0, 0), (0, 0)))
    t_out = (t + 2 * pt - kt) // st + 1
    out = None
    for dt in range(kt):
        xs = lax.slice_in_dim(x, dt, dt + st * (t_out - 1) + 1, st,
                              axis=1)
        xs = xs.reshape(n * t_out, h, w, c)
        o = lax.conv_general_dilated(
            xs, kernel[dt], (sh, sw), [(ph, ph), (pw, pw)],
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        out = o if out is None else out + o
    ho, wo = out.shape[1], out.shape[2]
    return out.reshape(n, t_out, ho, wo, f)


def _conv3d_xla(x, kernel, stride, padding):
    return lax.conv_general_dilated(
        x, kernel, window_strides=stride,
        padding=[(p, p) for p in padding],
        dimension_numbers=('NTHWC'.replace('T', 'D'),
                           'DHWIO', 'NDHWC'))


def _conv3d_tap2d(x, kernel, stride, padding):
    kt, kh, kw, c, f = kernel.shape
    st, sh, sw = stride
    pt, ph, pw = padding
    n, t, h, w, _ = x.shape

    if pt:
        x = jnp.pad(x, ((0, 0), (pt, pt), (0, 0), (0, 0), (0, 0)))
    t_pad = t + 2 * pt
    t_out = (t_pad - kt) // st + 1

    if kt == 1:
        x2 = x[:, ::st] if st > 1 else x
        x2 = x2[:, :t_out].reshape(n * t_out, h, w, c)
        k2 = kernel.reshape(kh, kw, c, f)
    else:
        # kt strided temporal taps, folded into channels
        taps = [
            lax.slice_in_dim(x, dt, dt + st * (t_out - 1) + 1, st, axis=1)
            for dt in range(kt)
        ]
        x2 = jnp.concatenate(taps, axis=-1)          # (n,t_out,h,w,kt*c)
        x2 = x2.reshape(n * t_out, h, w, kt * c)
        # channel order after concat is [tap0:C, tap1:C, ...] -> kernel
        # in-channel index dt*C + c
        k2 = jnp.transpose(kernel, (1, 2, 0, 3, 4)).reshape(
            kh, kw, kt * c, f)

    out = lax.conv_general_dilated(
        x2, k2, window_strides=(sh, sw),
        padding=[(ph, ph), (pw, pw)],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    ho, wo = out.shape[1], out.shape[2]
    return out.reshape(n, t_out, ho, wo, f)
