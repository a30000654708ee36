#!/usr/bin/env python
"""Trace the full MSCL train step with jax.profiler and print the
per-fusion device-time breakdown (works on the axon backend)."""
import argparse
import collections
import glob
import gzip
import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit('/tools', 1)[0])


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--batch-size', type=int, default=32)
    p.add_argument('--trace-dir', default='/tmp/mscl_step_trace')
    p.add_argument('--iters', type=int, default=3)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from __graft_entry__ import _mscl_batch, _mscl_cfg
    from mscl_tpu.apis.train import build_model_from_cfg
    from mscl_tpu.core import (build_lr_schedule, build_optimizer,
                               init_state, make_train_step)
    from mscl_tpu.models.recognizers import build_ema_fn, \
        sync_key_variables

    cfg = _mscl_cfg(num_frames=8, K=65536, max_iters=219136 * 400)
    dtype = jnp.bfloat16
    cfg['dtype'] = dtype
    cfg['recognizer'] = dict(cfg['recognizer'], dtype=dtype)
    cfg['recognizer_flow'] = dict(cfg['recognizer_flow'], dtype=dtype)
    model = build_model_from_cfg(cfg)
    batch = _mscl_batch(args.batch_size)
    lr = build_lr_schedule(dict(policy='CosineAnnealing', min_lr=0),
                           0.02, 400, 1712)
    tx = build_optimizer(
        dict(type='SGD', lr=0.02, momentum=0.9, weight_decay=1e-4), lr,
        grad_clip=dict(max_norm=40),
        freeze_patterns=('encoder_k', 'neck_k', 'mlp_k'))
    state = init_state(model, tx, batch,
                       post_init_fn=sync_key_variables)
    batch = {k: [jnp.asarray(v) for v in vs] for k, vs in batch.items()}
    step = jax.jit(make_train_step(model, tx, build_ema_fn(model)))

    t0 = time.time()
    for _ in range(3):
        state, log_vars = step(state, batch)
    print(f'warmup {time.time() - t0:.0f}s '
          f'loss={float(log_vars["loss"]):.3f}', file=sys.stderr,
          flush=True)

    with jax.profiler.trace(args.trace_dir):
        for _ in range(args.iters):
            state, log_vars = step(state, batch)
        _ = float(log_vars['loss'])

    # ------------------------------------------------- analyze
    paths = sorted(glob.glob(
        f'{args.trace_dir}/plugins/profile/*/*.trace.json.gz'))
    with gzip.open(paths[-1]) as f:
        data = json.load(f)
    events = data.get('traceEvents', [])
    pids = {e['pid']: e['args'].get('name', '') for e in events
            if e.get('ph') == 'M' and e.get('name') == 'process_name'}
    rows = collections.defaultdict(lambda: [0, 0.0])
    total = 0.0
    for e in events:
        if e.get('ph') == 'X' and 'dur' in e and \
                'TPU' in pids.get(e.get('pid'), ''):
            name = e.get('name', '')
            if name.startswith('jit_') or name in ('0', '1', '2', '3',
                                                   '4', '5'):
                continue
            rows[name][0] += 1
            rows[name][1] += e['dur']
            total += e['dur']
    print(f'accounted device time: {total / 1e3 / args.iters:.2f} '
          f'ms/step over {args.iters} steps')
    for name, (cnt, d) in sorted(rows.items(),
                                 key=lambda kv: -kv[1][1])[:40]:
        print(f'{d / 1e3 / args.iters:8.3f} ms/step  x{cnt:4d}  {name}')


if __name__ == '__main__':
    main()
    import os
    os._exit(0)
