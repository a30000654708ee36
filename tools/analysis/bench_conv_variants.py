#!/usr/bin/env python
"""Per-layer 3D-conv microbenchmark on the real TPU.

Times each r3d_18 conv shape (recipe: bs32, 8x112x112) under several
implementations — direct XLA 3D conv, tap-stacked 2D lowering, sum of
per-tap 2D convs — fwd and fwd+bwd, plus a numeric cross-check (hunting
the tap2d NaN seen in the full step). Run nohup'd; one TPU process only.
"""
import argparse
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit('/tools', 1)[0])


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--batch', type=int, default=32)
    p.add_argument('--dtype', default='bfloat16')
    p.add_argument('--iters', type=int, default=30)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from mscl_tpu.ops import conv3d as C

    dtype = jnp.bfloat16 if args.dtype == 'bfloat16' else jnp.float32
    b = args.batch
    # (name, in_shape NTHWC, kernel (kt,kh,kw,ci,co), stride, pad)
    layers = [
        ('stem', (b, 8, 112, 112, 3), (3, 7, 7, 3, 64), (1, 2, 2),
         (1, 3, 3)),
        ('l1', (b, 8, 56, 56, 64), (3, 3, 3, 64, 64), (1, 1, 1),
         (1, 1, 1)),
        ('l2d', (b, 8, 56, 56, 64), (3, 3, 3, 64, 128), (2, 2, 2),
         (1, 1, 1)),
        ('l2', (b, 4, 28, 28, 128), (3, 3, 3, 128, 128), (1, 1, 1),
         (1, 1, 1)),
        ('l3d', (b, 4, 28, 28, 128), (3, 3, 3, 128, 256), (2, 2, 2),
         (1, 1, 1)),
        ('l3', (b, 2, 14, 14, 256), (3, 3, 3, 256, 256), (1, 1, 1),
         (1, 1, 1)),
        ('l4d', (b, 2, 14, 14, 256), (3, 3, 3, 256, 512), (2, 2, 2),
         (1, 1, 1)),
        ('l4', (b, 1, 7, 7, 512), (3, 3, 3, 512, 512), (1, 1, 1),
         (1, 1, 1)),
    ]

    def sum_taps(x, k, stride, pad):
        kt = k.shape[0]
        st, sh, sw = stride
        pt, ph, pw = pad
        n, t, h, w, c = x.shape
        if pt:
            x = jnp.pad(x, ((0, 0), (pt, pt), (0, 0), (0, 0), (0, 0)))
        t_out = (t + 2 * pt - kt) // st + 1
        out = None
        for dt in range(kt):
            xs = jax.lax.slice_in_dim(
                x, dt, dt + st * (t_out - 1) + 1, st, axis=1)
            xs = xs.reshape(n * t_out, h, w, c)
            o = jax.lax.conv_general_dilated(
                xs, k[dt], (sh, sw), [(ph, ph), (pw, pw)],
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
            out = o if out is None else out + o
        ho, wo = out.shape[1], out.shape[2]
        return out.reshape(n, t_out, ho, wo, k.shape[-1])

    impls = {
        'xla3d': C._conv3d_xla,
        'tap2d': C._conv3d_tap2d,
        'sumtap': sum_taps,
    }

    rng = np.random.default_rng(0)
    print(f'devices: {jax.devices()}, dtype={args.dtype}',
          file=sys.stderr, flush=True)
    total = {k: [0.0, 0.0] for k in impls}
    for name, xs, ks, st, pd in layers:
        x = jnp.asarray(rng.normal(size=xs), dtype)
        k = jnp.asarray(rng.normal(size=ks) / np.sqrt(np.prod(ks[:4])),
                        dtype)
        flops = (2 * np.prod(ks) * b *
                 ((xs[1] + 2 * pd[0] - ks[0]) // st[0] + 1) / ks[3] *
                 (xs[2] // st[1]) * (xs[3] // st[2]) / b)
        flops = (2 * np.prod(ks[:3]) * ks[3] * ks[4] *
                 b * ((xs[1] + 2 * pd[0] - ks[0]) // st[0] + 1) *
                 (xs[2] // st[1]) * (xs[3] // st[2]))
        ref = None
        for iname, fn in impls.items():
            fwd = jax.jit(lambda x, k, fn=fn: fn(x, k, st, pd))
            g = jax.jit(jax.grad(
                lambda x, k, fn=fn: fn(x, k, st, pd).astype(
                    jnp.float32).sum(), argnums=(0, 1)))
            o = fwd(x, k)
            val = float(jnp.asarray(o, jnp.float32).sum())
            if ref is None:
                ref = val
            _ = g(x, k)
            t0 = time.time()
            for _ in range(args.iters):
                o = fwd(x, k)
            _ = float(jnp.asarray(o, jnp.float32)[0, 0, 0, 0, 0])
            fwd_ms = (time.time() - t0) / args.iters * 1e3
            t0 = time.time()
            for _ in range(args.iters):
                gs = g(x, k)
            _ = float(jnp.asarray(gs[1], jnp.float32).reshape(-1)[0])
            bwd_ms = (time.time() - t0) / args.iters * 1e3
            total[iname][0] += fwd_ms
            total[iname][1] += bwd_ms
            mfu = flops / (fwd_ms * 1e-3) / 197e12 * 100
            drift = abs(val - ref) / (abs(ref) + 1e-9)
            print(f'{name:5s} {iname:7s} fwd {fwd_ms:7.2f} ms '
                  f'({mfu:5.1f}% MFU)  fwd+bwd(grad) {bwd_ms:7.2f} ms  '
                  f'sum={val:.4g} drift={drift:.2e} '
                  f'finite={bool(np.isfinite(val))}',
                  flush=True)
    for iname, (f, bw) in total.items():
        print(f'TOTAL {iname:7s} fwd {f:7.2f} ms   grad {bw:7.2f} ms',
              flush=True)


if __name__ == '__main__':
    main()
    import os
    os._exit(0)
