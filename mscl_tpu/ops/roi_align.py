"""RoIAlign in jnp (aligned=True, average pooling).

Parity: mmcv RoIAlign as used by the reference AVA stack
(mmaction/models/roi_extractors/single_straight3d.py:80-89). Static-shape
TPU formulation: a fixed sampling grid of ``sampling_ratio``^2 points per
output bin (the reference's adaptive ceil(roi/out) grid is data-dependent;
fixed 2x2 matches detectron2's common configuration), bilinear sampling
with zero padding, vmapped over RoIs.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _bilinear_at(img, x, y):
    """img: (H, W, C); x, y: (...,) pixel coords; zero outside."""
    h, w = img.shape[0], img.shape[1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0

    def g(ix, iy):
        valid = (ix >= 0) & (ix <= w - 1) & (iy >= 0) & (iy <= h - 1)
        ixc = jnp.clip(ix, 0, w - 1).astype(jnp.int32)
        iyc = jnp.clip(iy, 0, h - 1).astype(jnp.int32)
        return img[iyc, ixc] * valid[..., None]

    return (g(x0, y0) * ((1 - wx) * (1 - wy))[..., None] +
            g(x0 + 1, y0) * (wx * (1 - wy))[..., None] +
            g(x0, y0 + 1) * ((1 - wx) * wy)[..., None] +
            g(x0 + 1, y0 + 1) * (wx * wy)[..., None])


def roi_align(features: jnp.ndarray, rois: jnp.ndarray,
              output_size: int = 7, spatial_scale: float = 1.0,
              sampling_ratio: int = 2, aligned: bool = True
              ) -> jnp.ndarray:
    """features: (N, H, W, C); rois: (R, 5) as (batch_idx, x1, y1, x2,
    y2) in image coords. Returns (R, output_size, output_size, C)."""
    s = max(sampling_ratio, 1)
    offset = 0.5 if aligned else 0.0

    def one_roi(roi):
        batch_idx = roi[0].astype(jnp.int32)
        x1 = roi[1] * spatial_scale - offset
        y1 = roi[2] * spatial_scale - offset
        x2 = roi[3] * spatial_scale - offset
        y2 = roi[4] * spatial_scale - offset
        roi_w = jnp.maximum(x2 - x1, 1e-6 if aligned else 1.0)
        roi_h = jnp.maximum(y2 - y1, 1e-6 if aligned else 1.0)
        bin_w = roi_w / output_size
        bin_h = roi_h / output_size
        # sampling grid: s points per bin per axis at bin-relative
        # positions (i + 0.5)/s
        gx = x1 + (jnp.arange(output_size * s) + 0.5) * (bin_w / s)
        gy = y1 + (jnp.arange(output_size * s) + 0.5) * (bin_h / s)
        xs, ys = jnp.meshgrid(gx, gy, indexing='xy')
        img = features[batch_idx]
        samples = _bilinear_at(img, xs, ys)  # (os*s, os*s, C)
        c = samples.shape[-1]
        samples = samples.reshape(output_size, s, output_size, s, c)
        return samples.mean(axis=(1, 3))

    return jax.vmap(one_roi)(rois)
