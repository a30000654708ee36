#!/usr/bin/env python
"""Per-family training throughput at the reference batch geometry.

BASELINE.md carries the reference's MMAction2 train s/iter table
(8x V100, reference docs/benchmark.md:49-60); this benches the rebuilt
zoo on one TPU chip at the SAME per-GPU batch + input geometry and
reports clips/s/chip vs the per-V100 equivalent (videos_per_gpu /
s_iter). One family per --model invocation (the axon TPU is exclusive
and compiles are minutes; run sequentially):

    python tools/analysis/bench_zoo.py --model tsn
"""
import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit('/tools', 1)[0])

# (config path, bs/GPU, (C, T, H, W), reference s/iter on 8xV100)
FAMILIES = {
    'tsn': ('configs/_base_/models/tsn_r50.py', 32, (3, 3, 224, 224),
            0.32),      # 1x1x3 segments -> (B, 3 segs, C, H, W)
    'tsm': ('configs/_base_/models/tsm_r50.py', 8, (8, 3, 224, 224),
            0.31),
    'i3d': ('configs/_base_/models/i3d_r50.py', 8, (3, 32, 224, 224),
            0.43),
    'slowonly': ('configs/_base_/models/slowonly_r50.py', 8,
                 (3, 4, 224, 224), 0.32),
    'slowfast': ('configs/_base_/models/slowfast_r50.py', 8,
                 (3, 32, 224, 224), 0.69),
    'r2plus1d': ('configs/recognition/r2plus1d/'
                 'r2plus1d_r18_8x8x1_180e_kinetics400_rgb.py', 8,
                 (3, 8, 224, 224), 0.45),
}


def run_all(args):
    """VERDICT r4 #8: the whole zoo sweep as ONE command writing ONE
    evidence JSON. Each family runs in a fresh subprocess (the axon TPU
    is exclusive and per-family compiles leak VMEM across programs), in
    train then serving mode, sequentially."""
    import os
    import subprocess
    rows = []
    for name in FAMILIES:
        for infer in (False, True):
            cmd = [sys.executable, os.path.abspath(__file__),
                   '--model', name, '--steps', str(args.steps),
                   '--warmup', str(args.warmup), '--dtype', args.dtype]
            if infer:
                cmd.append('--infer')
            mode = 'infer' if infer else 'train'
            print(f'=== {name} [{mode}] ===', file=sys.stderr, flush=True)
            out = subprocess.run(cmd, capture_output=True, text=True,
                                 timeout=3600)
            line = out.stdout.strip().splitlines()[-1] if \
                out.stdout.strip() else ''
            try:
                rows.append(json.loads(line))
            except json.JSONDecodeError:
                rows.append({'model': name, 'mode': mode, 'error':
                             (out.stderr or out.stdout)[-800:]})
            print(line or out.stderr[-400:], file=sys.stderr, flush=True)
    if args.out:
        os.makedirs(os.path.dirname(args.out) or '.', exist_ok=True)
        with open(args.out, 'w') as f:
            json.dump(rows, f, indent=1)
        print(f'wrote {args.out}', file=sys.stderr)
    print(json.dumps(rows))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--model', choices=list(FAMILIES))
    p.add_argument('--all', action='store_true',
                   help='sweep every family (train + serving) and write '
                        'one evidence JSON (--out)')
    p.add_argument('--out', default=None,
                   help='with --all: aggregate JSON path, e.g. '
                        'docs/evidence/zoo_r5.json')
    p.add_argument('--steps', type=int, default=50)
    p.add_argument('--warmup', type=int, default=3)
    p.add_argument('--dtype', default='bfloat16')
    p.add_argument('--infer', action='store_true',
                   help='measure forward-only (serving) throughput '
                        'instead of a training step')
    args = p.parse_args()
    if args.all:
        run_all(args)
        return
    if not args.model:
        p.error('--model or --all is required')

    import jax
    import jax.numpy as jnp

    from mscl_tpu.config import Config
    from mscl_tpu.apis.train import build_model_from_cfg
    from mscl_tpu.core import (build_lr_schedule, build_optimizer,
                               init_state, make_train_step)

    cfg_path, bs, shape, ref_s_iter = FAMILIES[args.model]
    cfg = Config.fromfile(cfg_path)
    model_cfg = dict(cfg['model'])
    dtype = jnp.bfloat16 if args.dtype == 'bfloat16' else jnp.float32
    model = build_model_from_cfg(model_cfg, dtype=dtype)

    rng = np.random.default_rng(0)
    if args.model in ('tsn', 'tsm'):
        imgs = rng.normal(size=(bs,) + shape).astype(np.float32)
    else:
        imgs = rng.normal(size=(bs, 1) + shape).astype(np.float32)
        imgs = imgs[:, 0] if False else imgs
        imgs = imgs.reshape((bs,) + shape)   # Recognizer3D takes NCTHW
    batch = {'imgs': imgs,
             'label': rng.integers(0, 400, size=(bs,))}

    lr = build_lr_schedule(dict(policy='fixed'), 0.01, 1, 1)
    tx = build_optimizer(dict(type='SGD', lr=0.01, momentum=0.9,
                              weight_decay=1e-4), lr,
                         grad_clip=dict(max_norm=40))
    state = init_state(model, tx, batch)

    if args.infer:
        variables = {'params': state.params,
                     'batch_stats': state.batch_stats}

        @jax.jit
        def fwd(imgs):
            return model.apply(variables, imgs, train=False,
                               return_loss=False)

        imgs = jnp.asarray(batch['imgs'])
        t0 = time.time()
        for _ in range(args.warmup):
            out = fwd(imgs)
        _ = np.asarray(jax.device_get(out[0, 0]))
        print(f'infer warmup+compile {time.time() - t0:.1f}s',
              file=sys.stderr)
        t0 = time.time()
        for _ in range(args.steps):
            out = fwd(imgs)
        _ = np.asarray(jax.device_get(out[0, 0]))
        dt = time.time() - t0
        print(json.dumps({
            'model': args.model, 'mode': 'infer', 'batch': bs,
            'input': list(shape),
            'ms_per_batch': round(dt / args.steps * 1000, 2),
            'clips_per_sec_per_chip': round(bs * args.steps / dt, 1),
        }), flush=True)
        return

    step = jax.jit(make_train_step(model, tx), donate_argnums=0)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    t0 = time.time()
    for _ in range(args.warmup):
        state, log_vars = step(state, batch)
    float(jax.device_get(log_vars['loss']))   # sync (not block_until_ready)
    print(f'warmup+compile {time.time() - t0:.1f}s', file=sys.stderr)

    t0 = time.time()
    for _ in range(args.steps):
        state, log_vars = step(state, batch)
    float(jax.device_get(log_vars['loss']))
    dt = time.time() - t0
    ms = dt / args.steps * 1000
    clips = bs * args.steps / dt
    ref_clips_per_gpu = bs / ref_s_iter
    print(json.dumps({
        'model': args.model, 'mode': 'train', 'batch': bs,
        'input': list(shape),
        'ms_per_step': round(ms, 1),
        'clips_per_sec_per_chip': round(clips, 1),
        'ref_v100_clips_per_sec_per_gpu': round(ref_clips_per_gpu, 1),
        'speedup_vs_v100': round(clips / ref_clips_per_gpu, 2),
    }), flush=True)


if __name__ == '__main__':
    main()
    import os
    os._exit(0)
