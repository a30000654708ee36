#!/usr/bin/env python
"""Full-step A/B of XLA/libtpu compile options (jit compiler_options).

The conv emitter leaves ~30% on the table for grad-input fusions
(docs/benchmark.md round-2 deep dive); flags that change fusion or
scoped-vmem policy are the remaining lever that costs no code. Each
option set compiles the COMPLETE MSCL train step and times it with the
device_get sync (the only trustworthy sync on axon).
"""
import sys
import time

sys.path.insert(0, __file__.rsplit('/tools', 1)[0])

import jax
import jax.numpy as jnp


def build():
    from __graft_entry__ import _mscl_batch, _mscl_cfg
    from mscl_tpu.apis.train import build_model_from_cfg
    from mscl_tpu.core import (build_lr_schedule, build_optimizer,
                               init_state, make_train_step)
    from mscl_tpu.models.recognizers import build_ema_fn, \
        sync_key_variables

    cfg = _mscl_cfg(num_frames=8, K=65536, max_iters=219136 * 400)
    cfg['dtype'] = jnp.bfloat16
    cfg['recognizer'] = dict(cfg['recognizer'], dtype=jnp.bfloat16)
    cfg['recognizer_flow'] = dict(cfg['recognizer_flow'],
                                  dtype=jnp.bfloat16)
    model = build_model_from_cfg(cfg)
    batch = _mscl_batch(32)
    lr = build_lr_schedule(dict(policy='CosineAnnealing', min_lr=0),
                           0.02, 400, 1712)
    tx = build_optimizer(
        dict(type='SGD', lr=0.02, momentum=0.9, weight_decay=1e-4), lr,
        grad_clip=dict(max_norm=40),
        freeze_patterns=('encoder_k', 'neck_k', 'mlp_k'))
    state = init_state(model, tx, batch,
                       post_init_fn=sync_key_variables)
    batch = {k: [jnp.asarray(v) for v in vs] for k, vs in batch.items()}
    step_fn = make_train_step(model, tx, build_ema_fn(model))
    return state, batch, step_fn


OPTION_SETS = {
    'baseline': {},
    'vmem64m': {'xla_tpu_scoped_vmem_limit_kib': '65536'},
    'no_rewrite_infeed': {
        'xla_tpu_licm_size_inflation_ratio': '2.0'},
    'async_all': {
        'xla_tpu_enable_data_parallel_all_reduce_opt': 'true',
        'xla_tpu_data_parallel_opt_different_sized_ops': 'true'},
}


def main():
    state, batch, step_fn = build()
    results = {}
    for name, opts in OPTION_SETS.items():
        try:
            compiled = (jax.jit(step_fn)
                        .lower(state, batch)
                        .compile(compiler_options=opts or None))
            s = state
            t0 = time.time()
            for _ in range(3):
                s, log = compiled(s, batch)
            _ = float(jax.device_get(log['loss']))
            t0 = time.time()
            for _ in range(15):
                s, log = compiled(s, batch)
            _ = float(jax.device_get(log['loss']))
            dt = (time.time() - t0) / 15 * 1e3
            results[name] = dt
            print(f'{name:20s} {dt:7.2f} ms/step', flush=True)
        except Exception as e:
            print(f'{name:20s} FAILED: {type(e).__name__}: '
                  f'{str(e)[:200]}', flush=True)
    return results


if __name__ == '__main__':
    main()
    import os
    os._exit(0)
