"""Device-side synchronized SSL augmentation (pure jnp, fused into the
jitted train step).

Parity targets (behavioral):
  - FlowVisualizer / flow_uv_to_colors  reference ssl_aug.py:87-136 — GPU
    color-wheel flow visualization (div255)
  - GaussianBlur (radius = int(0.1*img)//2*2+1, sigma ~ U[0.1, 2], one draw
    per call)                           ssl_aug.py:166-176
  - VideoRandomApply (p per video)      ssl_aug.py:138-163
  - clip-synchronized ColorJitter(0.4,0.4,0.4,0.1,p=0.8) + RandomGrayscale
    (p=0.2): with sync_level='batch' the APPLY decision is per-video while
    jitter parameters are per-frame (toVideoAug, ssl_aug.py:21-74); with
    'params' the parameters are also per-clip (toConsistentAug)
  - SyncMoCoAugmentV5                   ssl_aug_v2.py:50-133 — flips the RGB
    clip, visualizes + (optionally normalizes) + identically flips every
    '*flow_imgs_q/_k' entry, then applies the strong/weak per-branch aug
  - IdentityAug / MoCoAugment(V2)       ssl_aug.py:177-246

TPU design: everything here is shape-static jnp running inside jit — the
whole augmentation fuses with the encoder forward, so preprocessing costs
no extra HBM round-trips (BASELINE.json north star). Tensors are NTHWC.
Color-jitter factor formulas follow torchvision definitions applied in
fixed b->c->s->h order (kornia randomizes the order per call — a
distribution-level difference only).
"""
from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..builder import SSL_AUGS
from ...utils.flow_viz import make_colorwheel

# Module-level constants stay numpy: a jnp.array here would initialize
# the JAX backend at import time, which multiprocessing decode workers
# (which import this package to unpickle datasets) must never do. They
# become on-device constants when traced; dtype semantics are identical.
IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)

_COLORWHEEL = np.asarray(make_colorwheel(), dtype=np.float32)  # (55, 3)


# ------------------------------------------------------------- flow viz
# Wheel segment boundaries: RY=15, YG=6, GC=4, CB=11, BM=13, MR=6.
_SEG_STARTS = (0, 15, 21, 25, 36, 49, 55)


def _wheel_channels(k: jnp.ndarray):
    """Evaluate the 55-entry color wheel at integer index k (..., ) ->
    (r, g, b) channel tuple EXACTLY (floor-quantized ramps, values in
    [0, 255]) using a branchless select cascade — table gathers destroy
    TPU fusion throughput, arithmetic selects don't. Channels stay
    unstacked so the visualizer can cast each to the output dtype before
    the one final stack (no f32 (..., 3) concat at image scale)."""
    k = k.astype(jnp.float32)

    def ramp(start, length):
        return jnp.floor(255.0 * (k - start) / length)

    s = _SEG_STARTS
    # R channel: 255 | 255-ramp | 0 | 0 | ramp | 255
    r = jnp.where(k < s[1], 255.0,
        jnp.where(k < s[2], 255.0 - ramp(s[1], 6),
        jnp.where(k < s[4], 0.0,
        jnp.where(k < s[5], ramp(s[4], 13), 255.0))))
    # G channel: ramp | 255 | 255 | 255-ramp | 0 | 0
    g = jnp.where(k < s[1], ramp(s[0], 15),
        jnp.where(k < s[3], 255.0,
        jnp.where(k < s[4], 255.0 - ramp(s[3], 11), 0.0)))
    # G in GC segment stays 255 (covered by k < s[3] above)
    # B channel: 0 | 0 | ramp | 255 | 255 | 255-ramp
    b = jnp.where(k < s[2], 0.0,
        jnp.where(k < s[3], ramp(s[2], 4),
        jnp.where(k < s[5], 255.0, 255.0 - ramp(s[5], 6))))
    return r, g, b


def _wheel_at(k: jnp.ndarray) -> jnp.ndarray:
    return jnp.stack(_wheel_channels(k), axis=-1)


def flow_uv_to_colors(u: jnp.ndarray, v: jnp.ndarray,
                      convert_to_bgr: bool = False,
                      div255: bool = True, out_dtype=None) -> jnp.ndarray:
    """(..., H, W) flow components -> (..., H, W, 3) color image.
    Bit-identical to the host color wheel (utils/flow_viz.py)."""
    ncols = _COLORWHEEL.shape[0]
    rad = jnp.sqrt(jnp.square(u) + jnp.square(v))
    a = jnp.arctan2(-v, -u) / math.pi
    fk = (a + 1) / 2 * (ncols - 1)
    k0 = jnp.floor(fk)
    k1 = jnp.where(k0 + 1 == ncols, 0, k0 + 1)
    f = fk - k0
    ch0 = _wheel_channels(k0)
    ch1 = _wheel_channels(k1)
    inside = rad <= 1
    chans = []
    for c0, c1 in zip(ch0, ch1):  # identical per-channel math to the
        col = (1 - f) * (c0 / 255.0) + f * (c1 / 255.0)  # stacked form
        col = jnp.where(inside, 1 - rad * (1 - col), col * 0.75)
        ch = jnp.floor(255 * col)
        if div255:
            ch = ch / 255.0
        if out_dtype is not None:
            ch = ch.astype(out_dtype)
        chans.append(ch)
    if convert_to_bgr:
        chans = chans[::-1]
    return jnp.stack(chans, axis=-1)


class FlowVisualizer:
    """(B, T, H, W, 2) raw flow -> (B, T, H, W, 3) color images in [0,1]
    (reference ssl_aug.py:122-136 operates in CTHW; same math)."""

    def __call__(self, flows: jnp.ndarray) -> jnp.ndarray:
        u, v = flows[..., 0], flows[..., 1]
        # the wheel computes in f32 (exact floor-quantized ramps) but
        # each channel casts to the input dtype BEFORE the final stack:
        # downstream flips / normalize / stem conv — and the stacked
        # (..., 3) image itself — move bf16, not f32, through HBM
        return flow_uv_to_colors(u, v, convert_to_bgr=False, div255=True,
                                 out_dtype=flows.dtype)


# ---------------------------------------------------------- color math
def rgb_to_gray(img: jnp.ndarray) -> jnp.ndarray:
    w = jnp.array([0.299, 0.587, 0.114], img.dtype)
    return (img * w).sum(-1, keepdims=True)


def _rgb_to_hsv_channels(img: jnp.ndarray):
    """(..., 3) RGB -> (h, s, v) channel tuple — unstacked so the
    jitter's hue shift composes without a stack + scatter + re-split
    round-trip at image scale."""
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    maxc = jnp.max(img, axis=-1)
    minc = jnp.min(img, axis=-1)
    v = maxc
    delta = maxc - minc
    s = jnp.where(maxc > 0, delta / jnp.maximum(maxc, 1e-12), 0.0)
    safe_delta = jnp.maximum(delta, 1e-12)
    rc = (maxc - r) / safe_delta
    gc = (maxc - g) / safe_delta
    bc = (maxc - b) / safe_delta
    h = jnp.where(maxc == r, bc - gc,
                  jnp.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc))
    h = jnp.where(delta > 0, (h / 6.0) % 1.0, 0.0)
    return h, s, v


def rgb_to_hsv(img: jnp.ndarray) -> jnp.ndarray:
    return jnp.stack(_rgb_to_hsv_channels(img), axis=-1)


def _hsv_to_rgb_channels(h: jnp.ndarray, s: jnp.ndarray,
                         v: jnp.ndarray) -> jnp.ndarray:
    """Branchless HSV->RGB: f(n) = v - v*s*clip(min(k, 4-k), 0, 1) with
    k = (n + 6h) mod 6 — pure VPU arithmetic, no gathers (jnp.choose
    lowers to gathers that destroy TPU fusion throughput)."""

    def channel(n):
        k = (n + h * 6.0) % 6.0
        return v - v * s * jnp.clip(jnp.minimum(k, 4.0 - k), 0.0, 1.0)

    return jnp.stack([channel(5.0), channel(3.0), channel(1.0)], axis=-1)


def hsv_to_rgb(img: jnp.ndarray) -> jnp.ndarray:
    return _hsv_to_rgb_channels(img[..., 0], img[..., 1], img[..., 2])


def _per(shape_b, t, per_frame, rng, lo, hi):
    """Sample (B,) or (B,T) uniform factors broadcastable to (B,T,1,1,1)."""
    if per_frame:
        x = jax.random.uniform(rng, (shape_b, t), minval=lo, maxval=hi)
    else:
        x = jax.random.uniform(rng, (shape_b, 1), minval=lo, maxval=hi)
        x = jnp.broadcast_to(x, (shape_b, t))
    return x[:, :, None, None, None]


def color_jitter_video(rng, imgs: jnp.ndarray, brightness=0.4, contrast=0.4,
                       saturation=0.4, hue=0.1, p=0.8,
                       per_frame_params=True) -> jnp.ndarray:
    """(B, T, H, W, 3) in [0,1]; apply-decision per video, factor draws
    per frame ('batch' sync) or per clip ('params' sync)."""
    b, t = imgs.shape[:2]
    k_apply, kb, kc, ks, kh = jax.random.split(rng, 5)
    apply = jax.random.bernoulli(k_apply, p, (b,))[:, None, None, None, None]

    # factors sampled in f32, applied in the clip's dtype — otherwise an
    # f32 factor silently promotes every jitter pass on a bf16 clip back
    # to f32 (2x VPU width + HBM for stochastic-aug math)
    dt = imgs.dtype
    out = imgs
    bf = _per(b, t, per_frame_params, kb, max(0., 1 - brightness),
              1 + brightness).astype(dt)
    out = jnp.clip(out * bf, 0., 1.)
    cf = _per(b, t, per_frame_params, kc, max(0., 1 - contrast),
              1 + contrast).astype(dt)
    # the clip-wide mean accumulates in f32 (a 100k-element bf16 sum
    # would lose the mean itself), result back in the clip dtype
    mean = rgb_to_gray(out).mean(axis=(2, 3, 4), keepdims=True,
                                 dtype=jnp.float32).astype(dt)
    out = jnp.clip((out - mean) * cf + mean, 0., 1.)
    sf = _per(b, t, per_frame_params, ks, max(0., 1 - saturation),
              1 + saturation).astype(dt)
    gray = rgb_to_gray(out)
    out = jnp.clip((out - gray) * sf + gray, 0., 1.)
    if hue:
        hf = _per(b, t, per_frame_params, kh, -hue, hue).astype(dt)
        h, s, v = _rgb_to_hsv_channels(out)
        h = (h + hf[..., 0]) % 1.0
        out = jnp.clip(_hsv_to_rgb_channels(h, s, v), 0., 1.)
    return jnp.where(apply, out, imgs)


def random_grayscale_video(rng, imgs: jnp.ndarray, p=0.2) -> jnp.ndarray:
    b = imgs.shape[0]
    apply = jax.random.bernoulli(rng, p, (b,))[:, None, None, None, None]
    gray = jnp.broadcast_to(rgb_to_gray(imgs), imgs.shape)
    return jnp.where(apply, gray, imgs)


def gaussian_blur_video(rng, imgs: jnp.ndarray, sigma_range=(0.1, 2.0),
                        img_size=112, p=0.5) -> jnp.ndarray:
    """Per-video apply decision; one sigma draw per call (reference
    GaussianBlur samples a single python-random sigma per forward)."""
    b, t, h, w, c = imgs.shape
    radius = int(0.1 * img_size) // 2 * 2 + 1
    k_apply, k_sigma = jax.random.split(rng)
    apply = jax.random.bernoulli(k_apply, p, (b,))[:, None, None, None, None]
    sigma = jax.random.uniform(k_sigma, (), minval=sigma_range[0],
                               maxval=sigma_range[1])
    half = radius // 2
    xs = jnp.arange(-half, half + 1, dtype=jnp.float32)
    kern1d = jnp.exp(-0.5 * (xs / sigma) ** 2)
    # kernel built in f32 (11 taps — precision matters), applied in the
    # clip dtype so the depthwise convs don't promote bf16 clips to f32
    kern1d = (kern1d / kern1d.sum()).astype(imgs.dtype)
    flat = imgs.reshape(b * t, h, w, c)
    # separable depthwise blur (two 1-D convs — VPU friendly) with
    # reflect borders (kornia GaussianBlur2d's default border_type)
    kern_h = jnp.tile(kern1d.reshape(radius, 1, 1, 1), (1, 1, 1, c))
    kern_w = jnp.tile(kern1d.reshape(1, radius, 1, 1), (1, 1, 1, c))

    def depthwise(x, kernel):
        return jax.lax.conv_general_dilated(
            x, kernel, window_strides=(1, 1), padding='VALID',
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
            feature_group_count=c)

    padded = jnp.pad(flat, ((0, 0), (half, half), (0, 0), (0, 0)),
                     mode='reflect')
    blurred = depthwise(padded, kern_h)
    blurred = jnp.pad(blurred, ((0, 0), (0, 0), (half, half), (0, 0)),
                      mode='reflect')
    blurred = depthwise(blurred, kern_w)
    blurred = blurred.reshape(b, t, h, w, c)
    return jnp.where(apply, blurred, imgs)


def normalize_video(imgs: jnp.ndarray, mean=IMAGENET_MEAN,
                    std=IMAGENET_STD) -> jnp.ndarray:
    # constants applied in the clip dtype (f32 constants would promote a
    # bf16 clip's final normalize pass; output is bf16 downstream anyway)
    return (imgs - jnp.asarray(mean, imgs.dtype)) \
        / jnp.asarray(std, imgs.dtype)


def hflip_video(imgs: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Flip W axis where mask (B,) is True."""
    flipped = imgs[..., ::-1, :]
    return jnp.where(mask[:, None, None, None, None], flipped, imgs)


# ------------------------------------------------------------ aug classes
# All classes take/return NTHWC tensors and are pure: __call__(rng, ...).

@SSL_AUGS.register_module()
class IdentityAug:
    """reference ssl_aug.py:177-183."""

    def __call__(self, rng, im_q, im_k=None, aux_info=None):
        if im_k is None:
            return im_q
        return im_q, im_k, aux_info


@SSL_AUGS.register_module()
class MoCoAugment:
    """Plain per-frame MoCo v1 aug pipeline (reference ssl_aug.py:186-212):
    grayscale + jitter + flip + normalize, independent per frame."""

    def __init__(self, crop_size):
        self.crop_size = crop_size

    def augment(self, rng, clips):
        k1, k2, k3, k4 = jax.random.split(rng, 4)
        b, t = clips.shape[:2]
        # per-frame independence: treat frames as the video axis
        flat = clips.reshape(b * t, 1, *clips.shape[2:])
        flat = random_grayscale_video(k1, flat, p=0.2)
        flat = color_jitter_video(k2, flat, 0.4, 0.4, 0.4, 0.4, p=1.0)
        mask = jax.random.bernoulli(k3, 0.5, (b * t,))
        flat = hflip_video(flat, mask)
        flat = normalize_video(flat)
        return flat.reshape(clips.shape)

    def __call__(self, rng, im_q, im_k=None, aux_info=None):
        if im_k is None:
            return self.augment(rng, im_q)
        kq, kk = jax.random.split(rng)
        return (self.augment(kq, im_q), self.augment(kk, im_k), aux_info)


@SSL_AUGS.register_module()
class MoCoAugmentV2(MoCoAugment):
    """V2 adds per-frame gaussian blur p=0.5 (reference
    ssl_aug.py:214-246)."""

    def augment(self, rng, clips):
        k1, k2, k3, k4, k5 = jax.random.split(rng, 5)
        b, t = clips.shape[:2]
        flat = clips.reshape(b * t, 1, *clips.shape[2:])
        flat = color_jitter_video(k1, flat, 0.4, 0.4, 0.4, 0.1, p=0.8)
        flat = random_grayscale_video(k2, flat, p=0.2)
        flat = gaussian_blur_video(k3, flat, img_size=self.crop_size, p=0.5)
        mask = jax.random.bernoulli(k4, 0.5, (b * t,))
        flat = hflip_video(flat, mask)
        flat = normalize_video(flat)
        return flat.reshape(clips.shape)


def strong_aug(rng, clips, crop_size, per_frame_params=True):
    """ColorJitter(0.4,0.4,0.4,0.1,p=0.8) + Grayscale(0.2) + Blur(0.5) +
    ImageNet normalize, apply decisions per video (reference
    ssl_aug_v2.py:31-41)."""
    k1, k2, k3 = jax.random.split(rng, 3)
    clips = color_jitter_video(k1, clips, 0.4, 0.4, 0.4, 0.1, p=0.8,
                               per_frame_params=per_frame_params)
    clips = random_grayscale_video(k2, clips, p=0.2)
    clips = gaussian_blur_video(k3, clips, img_size=crop_size, p=0.5)
    return normalize_video(clips)


@SSL_AUGS.register_module()
class SyncMoCoAugmentV5:
    """reference ssl_aug_v2.py:50-133 — the mscl_r18 device aug:
    per-branch horizontal flip replayed onto visualized flow, strong/weak
    per-branch augmentation, optional flow normalization."""

    def __init__(self, crop_size, flip_transform=dict(p=0.5,
                                                      same_on_batch=False),
                 sync_level='batch', t=None, flow_suffix='flow_imgs',
                 img_width=112, visualize=True, weak_aug=(False, False),
                 normalize_flow=False):
        if isinstance(crop_size, (tuple, list)):
            crop_size = crop_size[0]
        self.crop_size = crop_size
        if isinstance(sync_level, str):
            sync_level = (sync_level, sync_level)
        assert all(v in ('batch', 'params') for v in sync_level)
        self.sync_level = sync_level
        self.flip_p = (flip_transform or {}).get('p', 0.5)
        self.flip_enabled = bool(flip_transform)
        self.flow_suffix = flow_suffix
        self.img_width = img_width
        self.visualize = visualize
        self.weak_aug = weak_aug
        self.normalize_flow = normalize_flow
        self.visualizer = FlowVisualizer() if visualize else None

    def _branch(self, rng, clips, aux_info, suffix, weak, sync):
        k_flip, k_aug = jax.random.split(rng)
        if self.flip_enabled:
            mask = jax.random.bernoulli(k_flip, self.flip_p,
                                        (clips.shape[0],))
        else:
            mask = jnp.zeros((clips.shape[0],), bool)
        clips = hflip_video(clips, mask)
        if self.flow_suffix:
            full_suffix = self.flow_suffix + suffix
            for k in list(aux_info):
                if k.endswith(full_suffix):
                    flow = aux_info[k]
                    if self.visualizer is not None:
                        flow = self.visualizer(flow)
                    if self.normalize_flow:
                        flow = normalize_video(flow)
                    aux_info[k] = hflip_video(flow, mask)
        if 'gt_bboxes' + suffix in aux_info:
            boxes = aux_info['gt_bboxes' + suffix]
            flipped = boxes.at[..., 0::4].set(
                self.img_width - boxes[..., 2::4])
            flipped = flipped.at[..., 2::4].set(
                self.img_width - boxes[..., 0::4])
            bmask = mask.reshape((-1,) + (1,) * (boxes.ndim - 1))
            aux_info['gt_bboxes' + suffix] = jnp.where(bmask, flipped,
                                                       boxes)
        if weak:
            clips = normalize_video(clips)
        else:
            clips = strong_aug(k_aug, clips, self.crop_size,
                               per_frame_params=(sync == 'batch'))
        return clips, aux_info

    def __call__(self, rng, im_q, im_k, aux_info):
        aux_info = dict(aux_info or {})
        kq, kk = jax.random.split(rng)
        im_q, aux_info = self._branch(kq, im_q, aux_info, '_q',
                                      self.weak_aug[0], self.sync_level[0])
        im_k, aux_info = self._branch(kk, im_k, aux_info, '_k',
                                      self.weak_aug[1], self.sync_level[1])
        return im_q, im_k, aux_info


@SSL_AUGS.register_module()
class SyncMoCoAugmentV3(SyncMoCoAugmentV5):
    """V3 = V5 with strong aug on both branches and flow visualization
    (reference ssl_aug.py:334-418)."""

    def __init__(self, crop_size, flip_transform=dict(p=0.5),
                 sync_level='batch', t=None, flow_suffix='flow_imgs',
                 img_width=112):
        super().__init__(crop_size, flip_transform, sync_level, t,
                         flow_suffix, img_width, visualize=True,
                         weak_aug=(False, False))


@SSL_AUGS.register_module()
class SyncMoCoAugmentV2(SyncMoCoAugmentV5):
    """V2 flips RGB + raw flow without visualization (reference
    ssl_aug.py:249-332)."""

    def __init__(self, crop_size, flip_transform=dict(p=0.5),
                 sync_level='batch', t=None, flow_suffix='flow_imgs',
                 img_width=112):
        super().__init__(crop_size, flip_transform, sync_level, t,
                         flow_suffix, img_width, visualize=False,
                         weak_aug=(False, False))


@SSL_AUGS.register_module()
class SyncMoCoAugmentV4(SyncMoCoAugmentV5):
    """V3 + on-the-fly motion maps from raw flow, flipped in sync with the
    clip and exposed as 'motion_maps_q/_k' (reference
    ssl_aug.py:420-513)."""

    def __init__(self, crop_size, flip_transform=dict(p=0.5),
                 sync_level='batch', t=None, flow_suffix='flow_imgs',
                 img_width=112, motion_pool='max'):
        super().__init__(crop_size, flip_transform, sync_level, t,
                         flow_suffix, img_width, visualize=True,
                         weak_aug=(False, False))
        from .motion_map import MotionMapCalculator
        self.motion_calc = MotionMapCalculator(pool=motion_pool)

    def _branch(self, rng, clips, aux_info, suffix, weak, sync):
        full_suffix = (self.flow_suffix or '') + suffix
        raw_flow = None
        for k in list(aux_info):
            if self.flow_suffix and k.endswith(full_suffix):
                raw_flow = aux_info[k]
        if raw_flow is not None and raw_flow.shape[-1] == 2:
            # same flip mask as the base class derives from this rng
            k_flip, _ = jax.random.split(rng)
            if self.flip_enabled:
                mask = jax.random.bernoulli(k_flip, self.flip_p,
                                            (clips.shape[0],))
            else:
                mask = jnp.zeros((clips.shape[0],), bool)
            mm = self.motion_calc(raw_flow)
            aux_info['motion_maps' + suffix] = hflip_video(mm, mask)
        return super()._branch(rng, clips, aux_info, suffix, weak, sync)
