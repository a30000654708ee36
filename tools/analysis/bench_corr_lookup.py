#!/usr/bin/env python
"""Correlation lookup benchmark at RAFT resolution (440x1024 -> 55x128
at 1/8): materialized all-pairs volume (flow/raft.py, the reference's
default path) vs the memory-efficient Pallas kernel / lax.scan tiling
(ops/corr_lookup.py, the alt_cuda_corr equivalent).

Reports wall time per lookup and the XLA memory analysis (argument +
temp allocation sizes) for each implementation. Run nohup'd on the TPU.
"""
import argparse
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit('/tools', 1)[0])


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--batch', type=int, default=1)
    p.add_argument('--h', type=int, default=55)    # 440 / 8
    p.add_argument('--w', type=int, default=128)   # 1024 / 8
    p.add_argument('--c', type=int, default=256)
    p.add_argument('--radius', type=int, default=4)
    p.add_argument('--levels', type=int, default=4)
    p.add_argument('--tile', type=int, default=64)
    p.add_argument('--iters', type=int, default=10)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from mscl_tpu.flow.raft import build_corr_pyramid, lookup_corr
    from mscl_tpu.ops.corr_lookup import (corr_lookup_pallas,
                                          corr_lookup_pallas_v2,
                                          corr_lookup_scan)

    rng = np.random.default_rng(0)
    n, h, w, c = args.batch, args.h, args.w, args.c
    f1 = jnp.asarray(rng.normal(size=(n, h, w, c)), jnp.float32)
    f2 = jnp.asarray(rng.normal(size=(n, h, w, c)), jnp.float32)
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing='ij')
    base = np.stack([xs, ys], -1)[None].repeat(n, 0)
    coords = jnp.asarray(base + rng.normal(scale=8.0, size=base.shape),
                         jnp.float32)

    def vol(f1, f2, coords):
        return lookup_corr(build_corr_pyramid(f1, f2, args.levels),
                           coords, args.radius)

    impls = {
        'volume': vol,
        'pallas': lambda a, b, cd: corr_lookup_pallas(
            a, b, cd, args.levels, args.radius, args.tile),
        'pallas_v2': lambda a, b, cd: corr_lookup_pallas_v2(
            a, b, cd, args.levels, args.radius, max(args.tile, 128)),
        'scan': lambda a, b, cd: corr_lookup_scan(
            a, b, cd, args.levels, args.radius, args.tile),
    }

    print(f'devices: {jax.devices()}  shape=({n},{h},{w},{c}) '
          f'r={args.radius} L={args.levels} tile={args.tile}',
          file=sys.stderr, flush=True)
    ref = None
    for name, fn in impls.items():
        jfn = jax.jit(fn)
        try:
            lowered = jfn.lower(f1, f2, coords)
            compiled = lowered.compile()
            try:
                ma = compiled.memory_analysis()
                mem = (f'temp={ma.temp_size_in_bytes / 1e6:.1f}MB '
                       f'args={ma.argument_size_in_bytes / 1e6:.1f}MB '
                       f'out={ma.output_size_in_bytes / 1e6:.1f}MB')
            except Exception as e:
                mem = f'mem-analysis-unavailable ({e})'
            out = jfn(f1, f2, coords)
            val = float(jnp.abs(out).sum())
            if ref is None:
                ref = val
            t0 = time.time()
            for _ in range(args.iters):
                out = jfn(f1, f2, coords)
            _ = float(out.reshape(-1)[0])
            dt = (time.time() - t0) / args.iters * 1e3
            drift = abs(val - ref) / (abs(ref) + 1e-9)
            print(f'{name:7s} {dt:8.2f} ms/lookup  {mem}  '
                  f'|out|={val:.6g} drift={drift:.2e}', flush=True)
        except Exception as e:
            print(f'{name:7s} FAILED: {type(e).__name__}: {e}',
                  flush=True)


if __name__ == '__main__':
    main()
    import os
    os._exit(0)
