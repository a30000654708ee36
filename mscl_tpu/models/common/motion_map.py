"""MotionMapCalculator — device-side motion-edge maps from flow.

Parity: reference mmaction/models/common/motion_map_calculator.py:6-44 —
Sobel-x/y on flow u and v -> gradient magnitude -> max/avg-pool (7,7) ->
nearest upsample back to the input resolution. Used by SyncMoCoAugmentV4
and MAMSCLWithAugPosHead (motion-map-weighted spatial LMCL).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# numpy on purpose: module-level jnp constants would initialize the JAX
# backend at import time (decode workers import this package).
_SOBEL_X = np.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], np.float32)
_SOBEL_Y = _SOBEL_X.T


def _conv2d_same(x, kernel):
    """(N, H, W, C) depthwise 3x3 conv with the same 2-D kernel per
    channel."""
    c = x.shape[-1]
    k = jnp.tile(kernel[:, :, None, None], (1, 1, 1, c))
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        feature_group_count=c)


class MotionMapCalculator:

    def __init__(self, pool='max', kernel_size=7, eps=1e-6):
        assert pool in ('max', 'avg')
        self.pool = pool
        self.kernel_size = kernel_size
        self.eps = eps

    def __call__(self, flows: jnp.ndarray) -> jnp.ndarray:
        """(B, T, H, W, 2) flow -> (B, T, H, W, 1) normalized motion map."""
        b, t, h, w, _ = flows.shape
        x = flows.reshape(b * t, h, w, 2)
        gx = _conv2d_same(x, _SOBEL_X)
        gy = _conv2d_same(x, _SOBEL_Y)
        mag = jnp.sqrt((gx ** 2 + gy ** 2).sum(-1, keepdims=True))
        k = self.kernel_size
        if self.pool == 'max':
            pooled = jax.lax.reduce_window(
                mag, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, k, k, 1),
                'SAME')
        else:
            pooled = jax.lax.reduce_window(
                mag, 0.0, jax.lax.add, (1, k, k, 1), (1, k, k, 1),
                'SAME') / (k * k)
        # nearest upsample back to (h, w)
        ph, pw = pooled.shape[1], pooled.shape[2]
        ih = jnp.clip((jnp.arange(h) * ph) // h, 0, ph - 1)
        iw = jnp.clip((jnp.arange(w) * pw) // w, 0, pw - 1)
        up = pooled[:, ih][:, :, iw]
        up = up / (up.max(axis=(1, 2, 3), keepdims=True) + self.eps)
        return up.reshape(b, t, h, w, 1)
