#!/usr/bin/env python
"""ShuffleBN A/B: global-batch BN vs the faithful per-group ShuffleBN.

SURVEY §7 "hard parts" requires validating that the ShuffleBN
replacement does not move parity. No real UCF101 exists in this
environment (zero egress), so the check runs on a structured synthetic
video dataset whose class is carried by MOTION DIRECTION (a square
translating left vs right vs up vs down) — exactly the signal MoCo
pretraining must organize. Protocol:
  1. pretrain MoCoV2 (slim 3D tower) with (a) shuffle_bn=0
     (global-batch BN, the SyncBN alternative) and (b) shuffle_bn=4
     (shared-PRNG permutation + per-group key BN stats — DDP ShuffleBN
     with world size 4), same seed/data/schedule
  2. record the InfoNCE loss trajectory for both
  3. kNN retrieval R@1/R@5 on a held-out split from pooled encoder_q
     features (tools/test_retrieval.py protocol)
Writes the table consumed by PARITY.md. Runs on the 8-device CPU mesh.
"""
import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit('/tools', 1)[0])

os.environ['XLA_FLAGS'] = (os.environ.get('XLA_FLAGS', '') +
                           ' --xla_force_host_platform_device_count=8')
import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')

import jax.numpy as jnp  # noqa: E402


def make_videos(n_per_class=16, t=8, hw=32, seed=0):
    """Class = motion direction of a bright square over noise."""
    rng = np.random.default_rng(seed)
    dirs = [(2, 0), (-2, 0), (0, 2), (0, -2)]
    clips, labels = [], []
    for cls, (dx, dy) in enumerate(dirs):
        for _ in range(n_per_class):
            x0 = rng.integers(8, hw - 16)
            y0 = rng.integers(8, hw - 16)
            base = rng.uniform(0, 0.3, size=(hw, hw, 3))
            frames = []
            for i in range(t):
                f = base + rng.normal(scale=0.02, size=(hw, hw, 3))
                xx = int(np.clip(x0 + dx * i, 0, hw - 8))
                yy = int(np.clip(y0 + dy * i, 0, hw - 8))
                f[yy:yy + 8, xx:xx + 8] += 0.6
                frames.append(np.clip(f, 0, 1))
            clips.append(np.stack(frames))      # (t, hw, hw, 3)
            labels.append(cls)
    return (np.asarray(clips, np.float32),
            np.asarray(labels, np.int64))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--steps', type=int, default=60)
    p.add_argument('--batch', type=int, default=16)
    p.add_argument('--out', default='work_dirs/shufflebn_ab.json')
    args = p.parse_args()

    from mscl_tpu.core import (build_lr_schedule, build_optimizer,
                               init_state, make_train_step)
    from mscl_tpu.models import BACKBONES, RECOGNIZERS
    from mscl_tpu.models.backbones.video_resnet import VideoResNet
    from mscl_tpu.models.recognizers import (build_ema_fn,
                                             sync_key_variables)
    from functools import partial
    if 'ab.tiny3d' not in BACKBONES:
        BACKBONES.register_module(
            name='ab.tiny3d',
            module=partial(VideoResNet, block='basic',
                           conv_makers=('simple3d',) * 4,
                           layers=(1, 1, 1, 1), stem='flow_basic',
                           base_width=16))

    clips, labels = make_videos()
    n = len(clips)
    train_idx = np.arange(n)[::2]       # alternating split
    test_idx = np.arange(n)[1::2]

    def run(shuffle_bn, seed=0):
        cfg = dict(
            backbone=dict(type='ab.tiny3d'),
            neck=dict(type='BaseMoCo'),
            moco_head=dict(type='MoCoHead',
                           loss_cls=dict(type='CrossEntropyLoss_torch',
                                         ignore_index=-1)),
            im_key='imgs', dim_in=128, dim=32, K=256, m_base=0.99,
            max_iters=args.steps * args.batch, T=0.07, mlp=True,
            aux_info=[],
            aug=dict(type='MoCoAugmentV2', crop_size=32),
            shuffle_bn=shuffle_bn)
        model = RECOGNIZERS.get('MoCoV2')(**cfg)
        lr = build_lr_schedule(dict(policy='CosineAnnealing', min_lr=0),
                               0.05, 1, args.steps)
        tx = build_optimizer(
            dict(type='SGD', lr=0.05, momentum=0.9, weight_decay=1e-4),
            lr, grad_clip=dict(max_norm=40),
            freeze_patterns=('encoder_k', 'neck_k', 'mlp_k'))
        rng = np.random.default_rng(seed)

        def batch_at(step):
            idx = rng.choice(train_idx, args.batch, replace=False)
            qk = []
            for shift in (0, 1):
                # temporal-shift positive pair: same clip, offset crop
                sel = clips[idx]
                if shift:
                    sel = np.roll(sel, 2, axis=1)
                qk.append(np.transpose(sel, (0, 4, 1, 2, 3)))
            return {'imgs': qk}

        state = init_state(model, tx, batch_at(0),
                           post_init_fn=sync_key_variables)
        step_fn = jax.jit(make_train_step(model, tx,
                                          build_ema_fn(model)),
                          donate_argnums=0)
        losses = []
        for s in range(args.steps):
            state, log_vars = step_fn(state, batch_at(s))
            losses.append(float(log_vars['loss']))

        # ---- retrieval: pooled encoder_q features
        @jax.jit
        def feats(params, batch_stats, x):
            bb = model.bind({'params': params,
                             'batch_stats': batch_stats,
                             'moco_state': state.moco_state})
            f = bb.encoder_q(x, train=False)
            f = f[-1] if isinstance(f, list) else f
            return f.mean(axis=(1, 2, 3))

        all_feats = np.asarray(feats(state.params, state.batch_stats,
                                     jnp.asarray(clips)))
        centered = all_feats - all_feats[train_idx].mean(0)
        normed = centered / np.maximum(
            np.linalg.norm(centered, axis=1, keepdims=True), 1e-8)
        sim = normed[test_idx] @ normed[train_idx].T
        order = np.argsort(-sim, axis=1)
        recalls = {}
        for k in (1, 5):
            hit = [(labels[train_idx[order[i, :k]]] ==
                    labels[test_idx[i]]).any()
                   for i in range(len(test_idx))]
            recalls[f'R@{k}'] = float(np.mean(hit))
        return dict(losses=losses, **recalls)

    out = {}
    for name, g in (('global_bn', 0), ('shuffle_bn4', 4)):
        print(f'=== {name} ===', flush=True)
        out[name] = run(g)
        print(f'{name}: final_loss={out[name]["losses"][-1]:.4f} '
              f'R@1={out[name]["R@1"]:.3f} R@5={out[name]["R@5"]:.3f}',
              flush=True)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, 'w') as f:
        json.dump(out, f, indent=1)
    print(f'wrote {args.out}')


if __name__ == '__main__':
    main()
