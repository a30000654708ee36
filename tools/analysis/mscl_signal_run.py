#!/usr/bin/env python
"""Full-composite MSCL learning-signal run (PARITY.md evidence).

The ShuffleBN A/B (shufflebn_ab.py) covers the MoCoV2 tower; this runs
the COMPLETE MSCLWithAug composite — RGB tower + flow tower (base + FRA
pass) + cross-modal head + LMCL head — on the motion-direction synthetic
dataset, where the optical flow is known ANALYTICALLY (uniform (dx, dy)
inside the moving square, zero outside), so the flow branch receives
exactly the signal it would from RAFT on real data. Reports:
  1. the trajectory of every loss family (InfoNCE, flow, cross-modal,
     LMCL)
  2. motion-retrieval R@1/R@5 from pooled encoder_q features after
     pretraining vs at random init (the transfer the paper claims)
Runs on the 8-device CPU mesh.
"""
import argparse
import json
import os
import sys
from functools import partial

import numpy as np

sys.path.insert(0, __file__.rsplit('/tools', 1)[0])

# --platform tpu runs the full-scale variant on the real chip;
# default is the 8-device CPU mesh (pre-import platform forcing)
_PLATFORM = 'tpu' if '--platform=tpu' in sys.argv or \
    ('--platform' in sys.argv and
     sys.argv[sys.argv.index('--platform') + 1] == 'tpu') else 'cpu'
if _PLATFORM == 'cpu':
    os.environ['XLA_FLAGS'] = (os.environ.get('XLA_FLAGS', '') +
                               ' --xla_force_host_platform_device_count=8')
import jax  # noqa: E402

if _PLATFORM == 'cpu':
    jax.config.update('jax_platforms', 'cpu')

import jax.numpy as jnp  # noqa: E402

HW, FLOW_HW, T = 32, 16, 4


def make_videos(n_per_class=16, seed=0):
    """Class = motion direction; returns clips, analytic flow, labels.
    Flow is at half resolution (the MSCL storage convention). The
    square size / step scale with HW so the task difficulty is
    comparable at 32x32 (tiny) and 112x112 (full-scale)."""
    rng = np.random.default_rng(seed)
    sq = HW // 4
    v = max(2, HW // 16)
    dirs = [(v, 0), (-v, 0), (0, v), (0, -v)]
    clips, flows, labels = [], [], []
    for cls, (dx, dy) in enumerate(dirs):
        for _ in range(n_per_class):
            x0 = int(rng.integers(sq, HW - 2 * sq))
            y0 = int(rng.integers(sq, HW - 2 * sq))
            base = rng.uniform(0, 0.3, size=(HW, HW, 3))
            fr, fl = [], []
            for i in range(T):
                f = base + rng.normal(scale=0.02, size=(HW, HW, 3))
                xx = int(np.clip(x0 + dx * i, 0, HW - sq))
                yy = int(np.clip(y0 + dy * i, 0, HW - sq))
                f[yy:yy + sq, xx:xx + sq] += 0.6
                fr.append(np.clip(f, 0, 1))
                flow = np.zeros((FLOW_HW, FLOW_HW, 2), np.float32)
                flow[yy // 2:(yy + sq) // 2,
                     xx // 2:(xx + sq) // 2] = (dx, dy)
                fl.append(flow)
            clips.append(np.stack(fr))
            flows.append(np.stack(fl))
            labels.append(cls)
    return (np.asarray(clips, np.float32),
            np.asarray(flows, np.float32),
            np.asarray(labels, np.int64))


def fra_rotate(flow, angle):
    """Flow Rotation Augmentation: rotate every (u, v) vector
    (reference transforms_motion.py:119-129 math)."""
    c, s = np.cos(angle), np.sin(angle)
    u, v = flow[..., 0], flow[..., 1]
    return np.stack([c * u - s * v, s * u + c * v], axis=-1)


def build_model(steps, batch, full_scale=False):
    from mscl_tpu.models import BACKBONES, RECOGNIZERS
    from mscl_tpu.models.backbones.video_resnet import VideoResNet
    if full_scale:
        from __graft_entry__ import _mscl_cfg
        from mscl_tpu.apis.train import build_model_from_cfg
        cfg = _mscl_cfg(num_frames=T, K=8192, max_iters=steps * batch)
        cfg['dtype'] = jnp.bfloat16
        cfg['recognizer'] = dict(cfg['recognizer'], dtype=jnp.bfloat16)
        cfg['recognizer_flow'] = dict(cfg['recognizer_flow'],
                                      dtype=jnp.bfloat16)
        return build_model_from_cfg(cfg)
    if 'sig.tiny3d' not in BACKBONES:
        BACKBONES.register_module(
            name='sig.tiny3d',
            module=partial(VideoResNet, block='basic',
                           conv_makers=('simple3d',) * 4,
                           layers=(1, 1, 1, 1), stem='flow_basic',
                           base_width=16))
    moco = lambda name: dict(   # noqa: E731
        type='MoCoV2',
        backbone=dict(type='sig.tiny3d'),
        neck=dict(type='BaseMoCo'),
        moco_head=dict(type='MoCoHead', basename=name,
                       loss_cls=dict(type='CrossEntropyLoss_torch',
                                     ignore_index=-1)),
        im_key='imgs', dim_in=128, dim=32, K=128, m_base=0.99,
        max_iters=steps * batch, T=0.07, mlp=True, aux_info=[],
        aug=dict(type='IdentityAug'))
    return RECOGNIZERS.get('MSCLWithAug')(
        recognizer=moco(''), recognizer_flow=moco('flow'),
        moco_mx_head=dict(type='MSCLWithAugMxHead', basename='mx',
                          loss_cls=dict(type='CrossEntropyLoss_torch',
                                        ignore_index=-1),
                          same_kn=True, T=0.07),
        sup_head=dict(type='MSCLWithAugPosHeadV2', basename='',
                      loss_pos=dict(type='CrossEntropyLoss_torch',
                                    ignore_index=-1),
                      bkb_channels=(16, 128), t=T // 2, T=0.07,
                      aux_keys=dict(
                          im_features=dict(q_mlvl='q_mlvl'),
                          base_flow_features=dict(q_mlvl='q_flow_mlvl'),
                          aug_flow_features=dict(
                              q_mlvl='q_aug_flow_mlvl'))),
        im_key='imgs', flow_key='flow_imgs', aux_info=[],
        update_aug_flow=False, weight_aug_flow=(1.0, 1.0),
        aug=dict(type='SyncMoCoAugmentV5', crop_size=HW,
                 sync_level=('batch', 'batch'), t=(T, T),
                 flow_suffix='flow_imgs', weak_aug=(False, False),
                 visualize=True),
        same_kn=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--steps', type=int, default=80)
    p.add_argument('--batch', type=int, default=16)
    p.add_argument('--platform', default='cpu', choices=['cpu', 'tpu'])
    p.add_argument('--full-scale', action='store_true',
                   help='the r18 recipe model at 112x112 (use with '
                        '--platform tpu)')
    p.add_argument('--out', default='work_dirs/mscl_signal.json')
    args = p.parse_args()
    if args.full_scale:
        global HW, FLOW_HW
        HW, FLOW_HW = 112, 56

    from mscl_tpu.core import (build_lr_schedule, build_optimizer,
                               init_state, make_train_step)
    from mscl_tpu.models.recognizers import (build_ema_fn,
                                             sync_key_variables)

    clips, flows, labels = make_videos()
    n = len(clips)
    train_idx = np.arange(n)[::2]
    test_idx = np.arange(n)[1::2]
    rng = np.random.default_rng(0)

    def batch_at(step):
        idx = rng.choice(train_idx, args.batch, replace=False)
        imgs, fimgs = [], []
        for shift in (0, 1):
            sel = clips[idx]
            fsel = flows[idx]
            if shift:
                sel = np.roll(sel, 1, axis=1)
                fsel = np.roll(fsel, 1, axis=1)
            # FRA: concat base + rotated flow along T
            cid = rng.integers(0, 8)
            ang = (0.2 + 0.2 * cid) * np.pi
            fcat = np.concatenate([fsel, fra_rotate(fsel, ang)], axis=1)
            imgs.append(np.transpose(sel, (0, 4, 1, 2, 3)))
            fimgs.append(np.transpose(fcat, (0, 4, 1, 2, 3)))
        return {'imgs': imgs, 'flow_imgs': fimgs}

    model = build_model(args.steps, args.batch,
                        args.full_scale)
    lr = build_lr_schedule(dict(policy='CosineAnnealing', min_lr=0),
                           0.05, 1, args.steps)
    tx = build_optimizer(
        dict(type='SGD', lr=0.05, momentum=0.9, weight_decay=1e-4),
        lr, grad_clip=dict(max_norm=40),
        freeze_patterns=('encoder_k', 'neck_k', 'mlp_k'))
    state = init_state(model, tx, batch_at(0),
                       post_init_fn=sync_key_variables)

    @jax.jit
    def feats(params, batch_stats, x):
        bb = model.bind({'params': params, 'batch_stats': batch_stats,
                         'moco_state': state.moco_state})
        f = bb.recognizer_m.encoder_q(x, train=False)
        f = f[-1] if isinstance(f, list) else f
        return f.mean(axis=(1, 2, 3))

    def retrieval(params, batch_stats):
        x = jnp.asarray(clips)          # encoder_q consumes NTHWC
        all_feats = np.asarray(feats(params, batch_stats, x))
        centered = all_feats - all_feats[train_idx].mean(0)
        normed = centered / np.maximum(
            np.linalg.norm(centered, axis=1, keepdims=True), 1e-8)
        sim = normed[test_idx] @ normed[train_idx].T
        order = np.argsort(-sim, axis=1)
        out = {}
        for k in (1, 5):
            hit = [(labels[train_idx[order[i, :k]]] ==
                    labels[test_idx[i]]).any()
                   for i in range(len(test_idx))]
            out[f'R@{k}'] = float(np.mean(hit))
        return out

    r_init = retrieval(state.params, state.batch_stats)
    print(f'random-init retrieval: {r_init}', flush=True)

    step_fn = jax.jit(make_train_step(model, tx, build_ema_fn(model)),
                      donate_argnums=0)
    track = {}
    for s in range(args.steps):
        state, log_vars = step_fn(state, batch_at(s))
        if s % 10 == 0 or s == args.steps - 1:
            snap = {k: round(float(v), 4) for k, v in log_vars.items()
                    if k.startswith('loss')}
            track[s] = snap
            print(f'step {s}: {snap}', flush=True)

    r_final = retrieval(state.params, state.batch_stats)
    print(f'pretrained retrieval: {r_final}', flush=True)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, 'w') as f:
        json.dump(dict(losses=track, retrieval_init=r_init,
                       retrieval_final=r_final), f, indent=1)
    print(f'wrote {args.out}')


if __name__ == '__main__':
    main()
