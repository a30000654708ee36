#!/usr/bin/env python
"""Ablation-ordering experiment: does the motion machinery do anything?

The paper's central claim (reference README.md:3-6 + its ablation table)
is that motion-sensitive contrastive learning (MSCL) beats cross-modal
distillation alone (MoDist) which beats plain appearance contrastive
(MoCo) at producing MOTION-discriminative representations. UCF101
parity is unmeasurable here (zero egress, PARITY.md), so this runs the
*ordering* proxy on a synthetic benchmark the repo fully controls:

- Videos: per-video random appearance (low-frequency background texture
  + a uniquely colored square); the square MOVES in one of 4 directions
  (= the motion class) only inside an 8-frame active window and sits
  still elsewhere. Optical flow is ANALYTIC (exact (dx, dy) inside the
  square while it moves, zero otherwise) — the flow branch receives the
  signal it would from RAFT with no estimation noise.
- Appearance is a perfect instance-discrimination shortcut (every video
  looks unique), so plain MoCo can solve its pretext task with zero
  motion sensitivity — exactly the failure mode MSCL claims to fix.

Arms (identical seeds, optimizer, schedule, aug, sampling unless the
arm IS the sampling ablation):
  moco        MoCoV2, RGB tower only               (reference moco.py)
  modist      + flow tower + cross-modal InfoNCE   (modist.py:9-132)
  mscl_nofra  + LMCL local alignment, single flow pass (mscl.py:9-134)
  mscl        full MSCLWithAug (FRA double flow pass) (mscl.py:137-260)
  mscl_nomds  full MSCLWithAug, uniform temporal sampling instead of
              MDS (ablates TemporalShiftChosenSampleFrames ->
              TemporalShiftSampleFrames, reference loading_mscl.py)

MDS here mirrors the reference pipeline: per-offset motion weight =
summed |flow| over the clip window, chosen_idx = offsets with weight >
median (tools/ssl/generate_mcl_samples.py semantics); q offset is
rejection-sampled into chosen_idx, k = q + uniform temporal shift
snapped to the nearest chosen offset (loading_mscl.py:210-243).

Downstream metrics (encoder_q pooled features, no fine-tuning):
  motion_R@1/R@5   direction retrieval, test->train kNN
  probe_acc        4-way linear probe on direction (trained on the
                   train split features, evaluated on test)
  instance_R@1     appearance control: match a STATIC clip of a test
                   video to the MOVING clip of the same video among all
                   videos (any arm should ace this — it shows MoCo
                   learns appearance fine, isolating the motion gap)

Usage (one arm per process; the TPU is exclusive):
  python tools/analysis/ablation_ordering.py --arm mscl --scale tiny
  python tools/analysis/ablation_ordering.py --arm moco --scale full \
      --platform tpu --steps 400
Writes docs/evidence/ablation/{arm}_{scale}_s{seed}.json.
"""
import argparse
import json
import os
import sys
from functools import partial

import numpy as np

sys.path.insert(0, __file__.rsplit('/tools', 1)[0])

_PLATFORM = 'cpu'
if '--platform' in sys.argv:
    _PLATFORM = sys.argv[sys.argv.index('--platform') + 1]
if _PLATFORM == 'cpu':
    os.environ['XLA_FLAGS'] = (os.environ.get('XLA_FLAGS', '') +
                               ' --xla_force_host_platform_device_count=8')
import jax  # noqa: E402

if _PLATFORM == 'cpu':
    jax.config.update('jax_platforms', 'cpu')

import jax.numpy as jnp  # noqa: E402

ARMS = ('moco', 'modist', 'mscl_nofra', 'mscl', 'mscl_nomds')
L = 16          # frames per video
W = 8           # active (moving) window length
DIRS4 = [(1, 0), (-1, 0), (0, 1), (0, -1)]


# ------------------------------------------------------------ dataset
def make_videos(n_per_class, hw, T, seed):
    """Appearance-rich, motion-sparse videos + analytic flow + MDS index.

    Returns dict with rgb (N, L, hw, hw, 3) f32 in [0, 1], flow
    (N, L, hw, hw, 2) f32, labels (N,), chosen (list of offset arrays,
    weight > median — generate_mcl_samples.py:128-133 semantics),
    best/worst (max-/min-motion-weight clip offset per video).
    """
    rng = np.random.default_rng(seed)
    sq = hw // 4
    v = max(2, hw // 16)
    n_off = L - T + 1
    rgb, flow, labels = [], [], []
    for cls, (ux, uy) in enumerate(DIRS4):
        dx, dy = ux * v, uy * v
        for _ in range(n_per_class):
            # background: low-frequency per-video texture
            grid = rng.uniform(0, 0.45, size=(8, 8, 3)).astype(np.float32)
            reps = -(-hw // 8)
            bg = np.kron(grid, np.ones((reps, reps, 1),
                                       np.float32))[:hw, :hw]
            color = rng.uniform(0.55, 1.0, size=3).astype(np.float32)
            a = int(rng.integers(0, L - W + 1))   # active window start
            # start position such that the whole trajectory stays
            # in-bounds (no clipping -> the analytic flow stays exact)
            lo_x = max(0, -dx * (W - 1))
            hi_x = hw - sq - max(0, dx * (W - 1))
            lo_y = max(0, -dy * (W - 1))
            hi_y = hw - sq - max(0, dy * (W - 1))
            x0 = int(rng.integers(lo_x, hi_x + 1))
            y0 = int(rng.integers(lo_y, hi_y + 1))
            fr = np.empty((L, hw, hw, 3), np.float32)
            fl = np.zeros((L, hw, hw, 2), np.float32)
            for t in range(L):
                k = np.clip(t - a, 0, W - 1)      # steps moved so far
                x, y = x0 + dx * k, y0 + dy * k
                img = bg + rng.normal(scale=0.02,
                                      size=(hw, hw, 3)).astype(np.float32)
                img[y:y + sq, x:x + sq] = color
                fr[t] = np.clip(img, 0, 1)
                if a <= t < a + W - 1:            # moving t -> t+1
                    fl[t, y:y + sq, x:x + sq] = (dx, dy)
            rgb.append(fr)
            flow.append(fl)
            labels.append(cls)
    rgb = np.stack(rgb)
    flow = np.stack(flow)
    labels = np.asarray(labels, np.int64)
    # MDS: per-offset motion weight, chosen = weight > median
    w = np.stack([np.abs(flow[:, o:o + T]).mean(axis=(1, 2, 3, 4))
                  for o in range(n_off)], axis=1)       # (N, n_off)
    med = np.median(w, axis=1, keepdims=True)
    chosen = [np.nonzero(w[i] > med[i])[0] for i in range(len(labels))]
    chosen = [c if len(c) else np.array([int(np.argmax(w[i]))])
              for i, c in enumerate(chosen)]
    return dict(rgb=rgb, flow=flow, labels=labels, chosen=chosen,
                best=w.argmax(axis=1), worst=w.argmin(axis=1),
                n_off=n_off)


def sample_pair_offsets(rng, data, vid, T, mds):
    """(q, k) clip offsets: MDS + temporal-shift positive pair
    (reference TemporalShiftChosenSampleFrames, loading_mscl.py:210-243)
    or plain uniform + shift (TemporalShiftSampleFrames, :286-375)."""
    n_off = data['n_off']
    if mds:
        chosen = data['chosen'][vid]
        q = chosen[0]
        for _ in range(10):                     # rejection sampling
            cand = int(rng.integers(0, n_off))
            if cand in chosen:
                q = cand
                break
        shift = int(rng.integers(-T, T + 1))
        k = int(chosen[np.abs(chosen - (q + shift)).argmin()])
    else:
        q = int(rng.integers(0, n_off))
        k = int(np.clip(q + rng.integers(-T, T + 1), 0, n_off - 1))
    return q, k


def fra_rotate(flow, angle):
    """Flow Rotation Augmentation: rotate every (u, v) vector
    (reference transforms_motion.py:119-129 math)."""
    c, s = np.cos(angle), np.sin(angle)
    u, v = flow[..., 0], flow[..., 1]
    return np.stack([c * u - s * v, s * u + c * v], axis=-1)


# ------------------------------------------------------------- models
def _towers(scale, T, K, steps, batch, hw):
    """Shared tower/head cfg pieces; every arm composes from these so
    the ONLY difference between arms is the loss machinery."""
    max_iters = steps * batch
    if scale == 'full':
        rgb_bb = dict(type='torchvision.r3d_18')
        rgb_neck = dict(type='TPNMoCo', in_channels=[128, 256, 512],
                        out_channels=128,
                        sepc_cfg=dict(in_channels=[128, 128, 128],
                                      out_channels=128, stride=(2, 2, 2),
                                      iBN=False, Pconv_num=2))
        flow_bb = dict(type='resnet_flow.r2d_18')
        dim_in_rgb, dim_in_flow, dim = 512, 128, 128
        bkb_channels = (None, None)
    else:
        from mscl_tpu.models import BACKBONES
        from mscl_tpu.models.backbones.video_resnet import VideoResNet
        if 'abl.tiny3d' not in BACKBONES:
            BACKBONES.register_module(
                name='abl.tiny3d',
                module=partial(VideoResNet, block='basic',
                               conv_makers=('simple3d',) * 4,
                               layers=(1, 1, 1, 1), stem='flow_basic',
                               base_width=16))
        rgb_bb = flow_bb = dict(type='abl.tiny3d')
        rgb_neck = dict(type='BaseMoCo')
        dim_in_rgb, dim_in_flow, dim = 128, 128, 32
        bkb_channels = (16, 128)

    def moco(backbone, neck, dim_in, basename):
        return dict(
            type='MoCoV2', backbone=backbone, neck=neck,
            moco_head=dict(type='MoCoHead', basename=basename,
                           loss_cls=dict(type='CrossEntropyLoss_torch',
                                         ignore_index=-1)),
            im_key='imgs', dim_in=dim_in, dim=dim, K=K, m_base=0.99,
            max_iters=max_iters, T=0.07, mlp=True, aux_info=[],
            aug=dict(type='IdentityAug'))

    aug = dict(type='SyncMoCoAugmentV5', crop_size=hw,
               sync_level=('batch', 'batch'), t=(T, T),
               flow_suffix='flow_imgs', weak_aug=(False, False),
               visualize=True)
    mx_head = dict(type='MSCLWithAugMxHead', basename='mx',
                   loss_cls=dict(type='CrossEntropyLoss_torch',
                                 ignore_index=-1),
                   same_kn=True, T=0.07)
    sup_head = dict(type='MSCLWithAugPosHeadV2', basename='',
                    loss_pos=dict(type='CrossEntropyLoss_torch',
                                  ignore_index=-1),
                    bkb_channels=bkb_channels, t=T // 2, T=0.07,
                    aux_keys=dict(
                        im_features=dict(q_mlvl='q_mlvl'),
                        base_flow_features=dict(q_mlvl='q_flow_mlvl'),
                        aug_flow_features=dict(q_mlvl='q_aug_flow_mlvl')))
    return (moco(rgb_bb, rgb_neck, dim_in_rgb, ''),
            moco(flow_bb, dict(type='BaseMoCo'), dim_in_flow, 'flow'),
            mx_head, sup_head, aug)


def build_arm(arm, scale, T, K, steps, batch, hw, dtype=None):
    from mscl_tpu.apis.train import build_model_from_cfg
    rgb, flw, mx_head, sup_head, aug = _towers(scale, T, K, steps,
                                               batch, hw)
    if arm == 'moco':
        cfg = dict(rgb, aug=aug)               # composite-level aug
    elif arm == 'modist':
        cfg = dict(type='MoDist', recognizer=rgb, recognizer_flow=flw,
                   moco_mx_head=mx_head, im_key='imgs',
                   flow_key='flow_imgs', aux_info=[], aug=aug,
                   same_kn=True)
    elif arm == 'mscl_nofra':
        # Single flow pass -> the LMCL head must not expect the rotated
        # (FRA) flow features; MoDistv2PosHead is the same local
        # frame-alignment loss with flow_source='single' (reference
        # moco_head_v2.py:129-196), so the ONLY delta vs the full arm is
        # FRA itself. At tiny scale the 3D flow tower's last level has
        # t=1 (a 1-class degenerate alignment task whose arange(t)
        # labels go out of range -> NaN CE), so align against flow
        # level 0 (t matches RGB level 0) there; the full-scale r2d
        # flow tower preserves time, keeping the recipe's (0, -1).
        sup_head = dict(sup_head, type='MoDistv2PosHead',
                        loss_pos=sup_head['loss_pos'],
                        mlvl_ids=(0, -1) if scale == 'full' else (0, 0),
                        aux_keys=dict(
                            im_features=dict(q_mlvl='q_mlvl'),
                            base_flow_features=dict(
                                q_mlvl='q_flow_mlvl')))
        cfg = dict(type='MSCL', recognizer=rgb, recognizer_flow=flw,
                   moco_mx_head=mx_head, sup_head=sup_head,
                   im_key='imgs', flow_key='flow_imgs',
                   flow_img_key='flow_imgs', aux_info=[], aug=aug,
                   same_kn=True)
    else:                                       # mscl / mscl_nomds
        cfg = dict(type='MSCLWithAug', recognizer=rgb,
                   recognizer_flow=flw, moco_mx_head=mx_head,
                   sup_head=sup_head, im_key='imgs',
                   flow_key='flow_imgs', aux_info=[],
                   update_aug_flow=False, weight_aug_flow=(1.0, 1.0),
                   aug=aug, same_kn=True)
    return build_model_from_cfg(cfg, dtype=dtype)


# ---------------------------------------------------------- batching
def sample_batch_idx(rng, data, train_idx, arm, batch, T):
    """Draw one batch's (vids, offsets, FRA angles) on the host.

    Consumes `rng` in EXACTLY the order the original monolithic
    make_batch did (choice, per-video offset pair, branch-0 angle,
    branch-1 angle), so runs are bit-comparable across batch modes and
    with the seed-0/1 evidence."""
    mds = arm != 'mscl_nomds'
    vids = rng.choice(train_idx, batch, replace=False)
    offs = np.asarray([sample_pair_offsets(rng, data, v, T, mds)
                       for v in vids], np.int32)          # (B, 2)
    angs = None
    if arm in ('mscl', 'mscl_nomds'):                     # FRA double pass
        angs = np.asarray([(0.2 + 0.2 * int(rng.integers(0, 8))) * np.pi
                           for _ in range(2)], np.float32)
    return vids.astype(np.int32), offs, angs


def make_batch(rng, data, train_idx, arm, batch, T):
    """One training batch in the model's NCTHW layout, materialized on
    the HOST. q/k = temporal-shift positive pair; flow clips track their
    RGB clips; FRA arms get [base, rotated] concatenated along T (the
    recipe pipeline layout, reference transforms_motion.py).

    NOTE: on the axon backend every host->device transfer buffer leaks
    (~130 MB/step at full scale -> ~52 GB RSS by step 325, observed as
    `memory allocation of 38535168/51380224 bytes failed` Rust aborts —
    exactly the f32 rgb/flow batch byte sizes). Training therefore uses
    assemble_batch_device below; this host path remains for init-shape
    derivation and the host/device exactness test."""
    vids, offs, angs = sample_batch_idx(rng, data, train_idx, arm,
                                        batch, T)
    out = {'imgs': [], 'flow_imgs': []}
    for branch in (0, 1):
        im = np.stack([data['rgb'][v, o:o + T]
                       for v, o in zip(vids, offs[:, branch])])
        out['imgs'].append(np.transpose(im, (0, 4, 1, 2, 3)))
        if arm != 'moco':
            fl = np.stack([data['flow'][v, o:o + T]
                           for v, o in zip(vids, offs[:, branch])])
            if angs is not None:
                fl = np.concatenate(
                    [fl, fra_rotate(fl, float(angs[branch]))],
                    axis=1).astype(np.float32)
            out['flow_imgs'].append(np.transpose(fl, (0, 4, 1, 2, 3)))
    if arm == 'moco':
        del out['flow_imgs']
    return out


def assemble_batch_device(drgb, dflow, vids, offs, angs, arm, T):
    """Build the same batch as make_batch ON DEVICE from device-resident
    rgb/flow arrays + per-step index arrays (a few hundred bytes of
    host->device traffic instead of ~130 MB — sidesteps the axon
    transfer-buffer leak). Traced inside the jitted train step; the
    video/frame gather is a standalone HLO gather (bandwidth-bound, not
    inside an elementwise fusion)."""
    tt = jnp.arange(T)
    out = {'imgs': []}
    if arm != 'moco':
        out['flow_imgs'] = []
    for branch in (0, 1):
        fidx = offs[:, branch, None] + tt                 # (B, T)
        im = drgb[vids[:, None], fidx]                    # (B,T,H,W,3)
        out['imgs'].append(jnp.transpose(im, (0, 4, 1, 2, 3)))
        if arm != 'moco':
            fl = dflow[vids[:, None], fidx]               # (B,T,H,W,2)
            if angs is not None:                          # FRA rotate
                c, s = jnp.cos(angs[branch]), jnp.sin(angs[branch])
                u, v = fl[..., 0], fl[..., 1]
                rot = jnp.stack([c * u - s * v, s * u + c * v], axis=-1)
                fl = jnp.concatenate([fl, rot], axis=1)
            out['flow_imgs'].append(jnp.transpose(fl, (0, 4, 1, 2, 3)))
    return out


# ---------------------------------------------------------------- eval
def eval_features(model, state, data, T, arm, chunk=32):
    """encoder_q pooled features for the max- and min-motion clip of
    every video."""
    tower = 'encoder_q' if arm == 'moco' else None

    # Variables are jit ARGUMENTS (not closure captures) for the same
    # reason as step_fn: captured arrays become program constants and
    # blow the axon remote-compile body limit at full scale.
    @jax.jit
    def feats(variables, x):
        bb = model.bind(variables)
        enc = bb.encoder_q if tower else bb.recognizer_m.encoder_q
        f = enc(x, train=False)
        f = f[-1] if isinstance(f, list) else f
        return f.mean(axis=(1, 2, 3)).astype(jnp.float32)

    variables = {'params': state.params,
                 'batch_stats': state.batch_stats,
                 'moco_state': state.moco_state}

    def run(offsets):
        clips = np.stack([data['rgb'][i, o:o + T]
                          for i, o in enumerate(offsets)])
        outs = [np.asarray(feats(variables,
                                 jnp.asarray(clips[i:i + chunk])))
                for i in range(0, len(clips), chunk)]
        return np.concatenate(outs)

    return run(data['best']), run(data['worst'])


def knn_retrieval(f_test, y_test, f_train, y_train, ks=(1, 5)):
    mu = f_train.mean(0)
    a = f_test - mu
    b = f_train - mu
    a /= np.maximum(np.linalg.norm(a, axis=1, keepdims=True), 1e-8)
    b /= np.maximum(np.linalg.norm(b, axis=1, keepdims=True), 1e-8)
    order = np.argsort(-(a @ b.T), axis=1)
    return {f'R@{k}': float(np.mean([(y_train[order[i, :k]] ==
                                      y_test[i]).any()
                                     for i in range(len(y_test))]))
            for k in ks}


def linear_probe(f_train, y_train, f_test, y_test, n_cls=4,
                 steps=500, lr=0.5, wd=1e-4):
    """Multinomial logistic regression on frozen features (the paper's
    linear-probe protocol, minus the dataset)."""
    mu, sd = f_train.mean(0), f_train.std(0) + 1e-6
    xtr = jnp.asarray((f_train - mu) / sd)
    xte = jnp.asarray((f_test - mu) / sd)
    ytr = jnp.asarray(y_train)
    wb = (jnp.zeros((f_train.shape[1], n_cls)), jnp.zeros((n_cls,)))

    def loss_fn(wb):
        logits = xtr @ wb[0] + wb[1]
        ll = jax.nn.log_softmax(logits)
        return (-ll[jnp.arange(len(ytr)), ytr].mean() +
                wd * (wb[0] ** 2).sum())

    @jax.jit
    def step(wb):
        g = jax.grad(loss_fn)(wb)
        return jax.tree_util.tree_map(lambda p, gg: p - lr * gg, wb, g)

    for _ in range(steps):
        wb = step(wb)
    pred = np.asarray(jnp.argmax(xte @ wb[0] + wb[1], axis=1))
    return float((pred == y_test).mean())


# ---------------------------------------------------------------- main
def main():
    p = argparse.ArgumentParser()
    p.add_argument('--arm', required=True, choices=list(ARMS))
    p.add_argument('--scale', default='tiny', choices=['tiny', 'full'])
    p.add_argument('--steps', type=int, default=None)
    p.add_argument('--batch', type=int, default=None)
    p.add_argument('--seed', type=int, default=0)
    p.add_argument('--platform', default='cpu', choices=['cpu', 'tpu'])
    p.add_argument('--n-per-class', type=int, default=24)
    p.add_argument('--out-dir', default='docs/evidence/ablation')
    args = p.parse_args()

    full = args.scale == 'full'
    hw, T = (112, 8) if full else (32, 4)
    batch = args.batch or (32 if full else 16)
    steps = args.steps or (400 if full else 300)
    K = 2048 if full else 256
    dtype = jnp.bfloat16 if full else jnp.float32

    from mscl_tpu.core import (build_lr_schedule, build_optimizer,
                               init_state, make_train_step)
    from mscl_tpu.models.recognizers import (build_ema_fn,
                                             sync_key_variables)

    data = make_videos(args.n_per_class, hw, T, seed=100)  # shared data
    n = len(data['labels'])
    train_idx = np.arange(n)[::2]
    test_idx = np.arange(n)[1::2]
    rng = np.random.default_rng(args.seed)

    model = build_arm(args.arm, args.scale, T, K, steps, batch, hw,
                      dtype=dtype)
    lr = build_lr_schedule(dict(policy='CosineAnnealing', min_lr=0),
                           0.05, 1, steps)
    tx = build_optimizer(
        dict(type='SGD', lr=0.05, momentum=0.9, weight_decay=1e-4),
        lr, grad_clip=dict(max_norm=40),
        freeze_patterns=('encoder_k', 'neck_k', 'mlp_k'))
    b0 = make_batch(np.random.default_rng(args.seed), data, train_idx,
                    args.arm, batch, T)
    state = init_state(model, tx, b0,
                       rng=jax.random.PRNGKey(args.seed),
                       post_init_fn=sync_key_variables)

    f_best, f_worst = eval_features(model, state, data, T, args.arm)
    init_metrics = dict(
        motion=knn_retrieval(f_best[test_idx], data['labels'][test_idx],
                             f_best[train_idx],
                             data['labels'][train_idx]),
        probe_acc=linear_probe(f_best[train_idx],
                               data['labels'][train_idx],
                               f_best[test_idx],
                               data['labels'][test_idx]),
        instance_R1=knn_retrieval(f_worst[test_idx], test_idx,
                                  f_best, np.arange(n),
                                  ks=(1,))['R@1'])
    print(f'[{args.arm}] random-init: {init_metrics}', flush=True)

    raw_step = make_train_step(model, tx, build_ema_fn(model))
    # Dataset lives on device ONCE (~385 MB f32 at full scale); each
    # step ships only index arrays. Per-step batch transfers leak their
    # staging buffers in the axon client (see make_batch docstring) —
    # three 400-step arms died at step ~325 from exactly this.
    # The dataset MUST be a jit ARGUMENT, not a closure capture: jit
    # bakes captured arrays into the lowered program as constants, and
    # on the axon remote-compile backend the serialized payload then
    # ships the whole dataset — rgb+flow arms die with HTTP 413
    # "request body length limit exceeded" (observed seed-2 campaign;
    # rgb-only moco squeaked under the limit).
    drgb = jax.device_put(data['rgb'])
    dflow = None if args.arm == 'moco' else jax.device_put(data['flow'])

    @partial(jax.jit, donate_argnums=0)
    def step_fn(state, drgb, dflow, vids, offs, angs):
        b = assemble_batch_device(drgb, dflow, vids, offs, angs,
                                  args.arm, T)
        return raw_step(state, b)

    track = {}
    import time
    t0 = time.time()
    for s in range(steps):
        vids, offs, angs = sample_batch_idx(rng, data, train_idx,
                                            args.arm, batch, T)
        state, log_vars = step_fn(state, drgb, dflow, vids, offs, angs)
        # Hard per-step sync (device_get, ~28 ms on axon): bounds
        # in-flight work during tunnel stalls.
        float(log_vars['loss'])
        if s % 25 == 0 or s == steps - 1:
            snap = {k: round(float(v), 4) for k, v in log_vars.items()
                    if k.startswith('loss')}
            track[s] = snap
            print(f'[{args.arm}] step {s} ({time.time() - t0:.0f}s): '
                  f'{snap}', flush=True)

    f_best, f_worst = eval_features(model, state, data, T, args.arm)
    final_metrics = dict(
        motion=knn_retrieval(f_best[test_idx], data['labels'][test_idx],
                             f_best[train_idx],
                             data['labels'][train_idx]),
        probe_acc=linear_probe(f_best[train_idx],
                               data['labels'][train_idx],
                               f_best[test_idx],
                               data['labels'][test_idx]),
        instance_R1=knn_retrieval(f_worst[test_idx], test_idx,
                                  f_best, np.arange(n),
                                  ks=(1,))['R@1'])
    print(f'[{args.arm}] pretrained: {final_metrics}', flush=True)

    os.makedirs(args.out_dir, exist_ok=True)
    out = os.path.join(args.out_dir,
                       f'{args.arm}_{args.scale}_s{args.seed}.json')
    with open(out, 'w') as f:
        json.dump(dict(arm=args.arm, scale=args.scale, seed=args.seed,
                       steps=steps, batch=batch, K=K, hw=hw, T=T,
                       n_videos=n, platform=_PLATFORM,
                       init=init_metrics, final=final_metrics,
                       losses=track), f, indent=1)
    print(f'wrote {out}', flush=True)


if __name__ == '__main__':
    main()
    os._exit(0)
