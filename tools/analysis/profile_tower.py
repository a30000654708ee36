#!/usr/bin/env python
"""Decompose the RGB tower's step time on the real TPU.

Times (bs 32, 8x112x112 bf16, device_get-synced):
  r3d_fwd        r3d_18 forward only
  r3d_fwdbwd     r3d_18 forward+backward (param grads)
  r3d_tpn_fwdbwd + TPNMoCo neck (FPN+SEPC)
  r2d_frames     control: 2D ResNet-18 on 256 frames fwd+bwd — same
                 conv families minus the temporal taps; isolates
                 "3D conv problem" vs "conv on this chip generally"
  mc3_fwdbwd     mc3_18 (3D taps only in layer1) fwd+bwd
Also attempts jax.profiler.trace on one step (may be unsupported on the
axon backend — failure is reported, not fatal).
"""
import argparse
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit('/tools', 1)[0])


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--batch', type=int, default=32)
    p.add_argument('--iters', type=int, default=10)
    p.add_argument('--trace-dir', default='')
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from mscl_tpu.models import BACKBONES, NECKS

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(size=(args.batch, 8, 112, 112, 3)),
                    jnp.bfloat16)
    frames = jnp.asarray(
        rng.uniform(size=(args.batch * 8, 112, 112, 3)), jnp.bfloat16)

    def timeit(fn, *a):
        out = fn(*a)
        _ = float(jnp.asarray(out, jnp.float32).reshape(-1)[0])
        t0 = time.time()
        for _ in range(args.iters):
            out = fn(*a)
        _ = float(jnp.asarray(out, jnp.float32).reshape(-1)[0])
        return (time.time() - t0) / args.iters * 1e3

    results = {}

    def bb(name, **kw):
        m = BACKBONES.get(name)(dtype=jnp.bfloat16, **kw)
        v = m.init(jax.random.PRNGKey(0), x, train=False)
        return m, v

    # --- r3d fwd
    m, v = bb('torchvision.r3d_18', single_out=True)
    fwd = jax.jit(lambda v, x: m.apply(v, x, train=False).astype(
        jnp.float32).mean())
    results['r3d_fwd_ms'] = timeit(fwd, v, x)

    bs_stats = v.get('batch_stats', {})
    g = jax.jit(jax.grad(lambda p, x: m.apply(
        {'params': p, 'batch_stats': bs_stats}, x,
        train=False).astype(jnp.float32).mean()))

    def gfirst(p, x):
        return jax.tree.leaves(g(p, x))[0]
    results['r3d_fwdbwd_ms'] = timeit(jax.jit(gfirst), v['params'], x)

    # --- + TPN neck
    m2, v2 = bb('torchvision.r3d_18')
    neck = NECKS.get('TPNMoCo')(
        in_channels=[128, 256, 512], out_channels=128,
        sepc_cfg=dict(in_channels=[128, 128, 128], out_channels=128,
                      stride=(2, 2, 2), iBN=False, Pconv_num=2),
        dtype=jnp.bfloat16)
    feats = m2.apply(v2, x, train=False)
    vn = neck.init(jax.random.PRNGKey(0), feats, train=False)

    bs2 = v2.get('batch_stats', {})
    bsn = vn.get('batch_stats', {})

    def tower(params, x):
        f = m2.apply({'params': params['bb'], 'batch_stats': bs2}, x,
                     train=False)
        emb, _ = neck.apply({'params': params['neck'],
                             'batch_stats': bsn}, f, train=False)
        return emb.astype(jnp.float32).mean()

    pt = {'bb': v2['params'], 'neck': vn['params']}
    gt = jax.jit(lambda p, x: jax.tree.leaves(jax.grad(tower)(p, x))[0])
    results['r3d_tpn_fwdbwd_ms'] = timeit(gt, pt, x)

    # --- 2D control (frames as batch)
    m3 = BACKBONES.get('ResNet')(depth=18, dtype=jnp.bfloat16)
    v3 = m3.init(jax.random.PRNGKey(0), frames, train=False)
    bs3 = v3.get('batch_stats', {})
    g3 = jax.jit(lambda p, fr: jax.tree.leaves(jax.grad(
        lambda p, fr: m3.apply({'params': p, 'batch_stats': bs3}, fr,
                               train=False).astype(
            jnp.float32).mean())(p, fr))[0])
    results['r2d_frames_fwdbwd_ms'] = timeit(g3, v3['params'], frames)

    # --- mc3 (temporal conv only in stem+layer1)
    m4, v4 = bb('torchvision.mc3_18', single_out=True)
    bs4 = v4.get('batch_stats', {})
    g4 = jax.jit(lambda p, x: jax.tree.leaves(jax.grad(
        lambda p, x: m4.apply({'params': p, 'batch_stats': bs4}, x,
                              train=False).astype(
            jnp.float32).mean())(p, x))[0])
    results['mc3_fwdbwd_ms'] = timeit(g4, v4['params'], x)

    for k, val in results.items():
        print(f'{k}: {val:.1f}', flush=True)

    if args.trace_dir:
        try:
            with jax.profiler.trace(args.trace_dir):
                for _ in range(3):
                    out = gt(pt, x)
                _ = float(jnp.asarray(out, jnp.float32).reshape(-1)[0])
            print(f'trace written to {args.trace_dir}', flush=True)
        except Exception as e:
            print(f'profiler unsupported: {type(e).__name__}: {e}',
                  flush=True)


if __name__ == '__main__':
    main()
    import os
    os._exit(0)
