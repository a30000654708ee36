#!/usr/bin/env python
"""Benchmark: MSCL r18 pretrain throughput (clips/sec/chip).

Measures the full jitted MSCL training step (device aug + RGB r3d_18/TPN
tower + slim flow tower x2 + InfoNCE over the 65536-slot queue +
cross-modal + LMCL losses + SGD update + EMA) on synthetic device-resident
batches at the reference recipe shapes (bs 32/chip, 8x112x112 RGB,
2x8x56x56 raw flow — flow is stored at half resolution, SURVEY §2.3).

Baseline: the reference publishes no MSCL throughput (SURVEY §6). We
estimate the reference's A100 throughput from FLOPs: ~95 GFLOPs/clip
(r3d_18 fwd 20.4 GF x3 for fwd+bwd + key fwd + slim flow tower x2 passes)
at ~20% MFU for PyTorch NCTHW 3D convs on A100 (312 bf16 TFLOPs) ~= 600
clips/s/GPU. BASELINE.json's target is >=4x that on v5p.
vs_baseline reported here = clips_per_sec_per_chip / 600.

Output: ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
"""
import argparse
import json
import sys
import time

import numpy as np

EST_REFERENCE_A100_CLIPS_PER_SEC = 600.0


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--batch-size', type=int, default=32)
    parser.add_argument('--num-frames', type=int, default=8)
    parser.add_argument('--hw', type=int, default=112)
    parser.add_argument('--steps', type=int, default=100)
    parser.add_argument('--warmup', type=int, default=3)
    parser.add_argument('--dtype', default='bfloat16',
                        choices=['float32', 'bfloat16'])
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    from __graft_entry__ import _mscl_batch, _mscl_cfg
    from mscl_tpu.apis.train import build_model_from_cfg
    from mscl_tpu.core import (build_lr_schedule, build_optimizer,
                               init_state, make_train_step)
    from mscl_tpu.models.recognizers import build_ema_fn, \
        sync_key_variables
    from mscl_tpu.parallel.mesh import create_mesh, shard_batch

    bs = args.batch_size
    cfg = _mscl_cfg(num_frames=args.num_frames, K=65536,
                    max_iters=219136 * 400)
    dtype = jnp.bfloat16 if args.dtype == 'bfloat16' else jnp.float32
    cfg['dtype'] = dtype
    cfg['recognizer']['dtype'] = dtype
    cfg['recognizer_flow']['dtype'] = dtype
    model = build_model_from_cfg(cfg)
    batch = _mscl_batch(bs, num_frames=args.num_frames, hw=args.hw,
                        flow_hw=args.hw // 2)

    lr = build_lr_schedule(
        dict(policy='CosineAnnealing', min_lr=0), 0.02, 400, 1712)
    tx = build_optimizer(
        dict(type='SGD', lr=0.02, momentum=0.9, weight_decay=1e-4), lr,
        grad_clip=dict(max_norm=40),
        freeze_patterns=('encoder_k', 'neck_k', 'mlp_k'))

    print(f'devices: {jax.devices()}', file=sys.stderr)
    mesh = create_mesh()
    n_chips = len(mesh.devices.flatten())
    state = init_state(model, tx, batch,
                       post_init_fn=sync_key_variables)
    step = jax.jit(make_train_step(model, tx, build_ema_fn(model)),
                   donate_argnums=0)
    device_batch = shard_batch(batch, mesh)

    # NOTE: block_until_ready is unreliable on the axon remote backend
    # (returns before execution completes) — a device_get of the loss is
    # the only trustworthy synchronization point.
    t0 = time.time()
    for _ in range(args.warmup):
        state, log_vars = step(state, device_batch)
    float(jax.device_get(log_vars['loss']))
    print(f'warmup+compile: {time.time() - t0:.1f}s', file=sys.stderr)

    t0 = time.time()
    for _ in range(args.steps):
        state, log_vars = step(state, device_batch)
    last_loss = float(jax.device_get(log_vars['loss']))
    dt = time.time() - t0

    clips_per_sec = args.steps * bs / dt
    per_chip = clips_per_sec / n_chips
    print(f'{args.steps} steps in {dt:.2f}s '
          f'({dt / args.steps * 1000:.1f} ms/step), loss='
          f'{last_loss:.3f}', file=sys.stderr)
    print(json.dumps({
        'metric': 'mscl_r18_pretrain_clips_per_sec_per_chip',
        'value': round(per_chip, 2),
        'unit': 'clips/s/chip',
        'vs_baseline': round(
            per_chip / EST_REFERENCE_A100_CLIPS_PER_SEC, 3),
    }), flush=True)


if __name__ == '__main__':
    main()
    # the remote TPU backend can hang in teardown; the result is already
    # flushed, so exit hard to guarantee the driver sees termination
    import os
    os._exit(0)
