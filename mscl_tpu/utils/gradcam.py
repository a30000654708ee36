"""GradCAM for video recognizers.

Parity: reference mmaction/utils/gradcam_utils.py + demo/
demo_gradcam_mscl.py — class-activation maps over the last backbone
feature map. Functional formulation: weights = spatial mean of
d(score_target)/d(featmap); cam = relu(sum_c w_c * featmap_c), normalized
and upsampled to the clip resolution.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def gradcam_3d(model, variables, imgs, target_index: Optional[int] = None):
    """imgs: NCTHW batch (with or without the clip dim). Returns
    (cam (N, T, H, W) in [0, 1] at feature resolution, scores)."""

    def feat_fn(x):
        return model.apply(variables, x,
                           method=lambda m, y: m.extract_feat(
                               _to_nthwc(y), train=False))

    def _to_nthwc(x):
        x = x.reshape((-1,) + x.shape[-4:])
        return jnp.transpose(x, (0, 2, 3, 4, 1))

    def head_fn(feat):
        return model.apply(variables, feat,
                           method=lambda m, f: m.cls_head_m(f,
                                                            train=False))

    feat = feat_fn(imgs)
    scores = head_fn(feat)
    if target_index is None:
        target_index = jnp.argmax(scores, axis=-1)
    else:
        target_index = jnp.full((scores.shape[0],), target_index,
                                jnp.int32)

    def target_score(f):
        s = head_fn(f)
        return jnp.take_along_axis(s, target_index[:, None],
                                   axis=1).sum()

    grads = jax.grad(target_score)(feat)
    weights = grads.mean(axis=(1, 2, 3), keepdims=True)  # (N,1,1,1,C)
    cam = jax.nn.relu((weights * feat).sum(axis=-1))     # (N, T, H, W)
    cam_min = cam.min(axis=(1, 2, 3), keepdims=True)
    cam_max = cam.max(axis=(1, 2, 3), keepdims=True)
    cam = (cam - cam_min) / jnp.maximum(cam_max - cam_min, 1e-12)
    return cam, scores


def overlay_cam(frames: np.ndarray, cam: np.ndarray,
                alpha: float = 0.5) -> np.ndarray:
    """Blend cam heatmaps onto uint8 frames (T, H, W, 3)."""
    import cv2
    t, h, w = frames.shape[:3]
    out = []
    cam_t = cam.shape[0]
    for i in range(t):
        c = cam[min(i * cam_t // t, cam_t - 1)]
        c = cv2.resize(np.asarray(c, np.float32), (w, h))
        heat = cv2.applyColorMap((c * 255).astype(np.uint8),
                                 cv2.COLORMAP_JET)
        heat = cv2.cvtColor(heat, cv2.COLOR_BGR2RGB)
        out.append((alpha * heat + (1 - alpha) * frames[i]).astype(
            np.uint8))
    return np.stack(out)
