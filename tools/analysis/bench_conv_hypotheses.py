#!/usr/bin/env python
"""A/B conv-throughput hypotheses from the round-2 step profile.

Profile facts (tools/analysis/profile_step.py, v5e, MSCL r18 bs32):
  - fwd 3x3x3 64->64 convs:   92 TF/s  (~N=64 MXU half-fill ceiling)
  - grad-weight convs:        94 TF/s
  - grad-input convs:         48 TF/s  <- fused with BN-bwd reductions
Hypotheses tested here (each as a scanned loop so the ~0.9 ms per-dispatch
axon overhead amortizes):
  1. a plain gin-style conv (reversed kernel) runs at ~92 like fwd
  2. the reduce epilogue is what halves it (conv+reductions in one fusion)
  3. an optimization_barrier between conv and reductions restores speed
  4. batch_group_count=2 packs two towers' convs into one N=128 conv
     at ~150 TF/s instead of 2x N=64 at 92
"""
import argparse
import sys
import time

sys.path.insert(0, __file__.rsplit('/tools', 1)[0])

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

DN = ('NDHWC', 'DHWIO', 'NDHWC')


def timed(fn, *args, iters=3):
    out = jax.jit(fn)(*args)
    _ = float(jnp.sum(out[0] if isinstance(out, tuple) else out))
    best = 1e9
    jfn = jax.jit(fn)
    for _ in range(iters):
        t0 = time.time()
        out = jfn(*args)
        _ = float(jnp.sum(out[0] if isinstance(out, tuple) else out))
        best = min(best, time.time() - t0)
    return best


def conv(x, w):
    return lax.conv_general_dilated(
        x, w, (1, 1, 1), [(1, 1)] * 3, dimension_numbers=DN)


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--steps', type=int, default=20)
    args = p.parse_args()
    steps = args.steps
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (32, 8, 56, 56, 64), jnp.bfloat16)
    w = jax.random.normal(key, (3, 3, 3, 64, 64), jnp.bfloat16) * 0.1
    flops = 2 * 32 * 8 * 56 * 56 * 64 * 64 * 27 * steps

    def report(name, t, fl=flops):
        print(f'{name:34s} {t * 1e3:8.2f} ms  {fl / t / 1e12:6.1f} TF/s',
              flush=True)

    # 1. plain fwd conv chain
    def fwd_chain(x, w):
        def body(x, _):
            return conv(x, w) * 0.02, None
        return lax.scan(body, x, None, length=steps)[0]
    report('fwd conv chain', timed(fwd_chain, x, w))

    # 1b. gin-style: reversed kernel (as autodiff emits)
    def gin_chain(x, w):
        wr = w[::-1, ::-1, ::-1].transpose(0, 1, 2, 4, 3)
        def body(x, _):
            return conv(x, wr) * 0.02, None
        return lax.scan(body, x, None, length=steps)[0]
    report('gin-style conv chain', timed(gin_chain, x, w))

    # 2. conv + 3 f32 reductions consuming the output (mimic gin fusion)
    def gin_fused(x, w):
        def body(carry, _):
            x, acc = carry
            y = conv(x, w)
            yf = y.astype(jnp.float32)
            s1 = jnp.sum(yf, axis=(0, 1, 2, 3))
            s2 = jnp.sum(yf * yf, axis=(0, 1, 2, 3))
            s3 = jnp.sum(jnp.abs(yf), axis=(0, 1, 2, 3))
            return (y * 0.02, acc + s1 + s2 + s3), None
        (x, acc), _ = lax.scan(body, (x, jnp.zeros((64,))), None,
                               length=steps)
        return x, acc
    report('conv + 3 reduce epilogue', timed(gin_fused, x, w))

    # 3. same with a barrier between conv and the reductions
    def gin_barrier(x, w):
        def body(carry, _):
            x, acc = carry
            y = conv(x, w)
            yb = lax.optimization_barrier(y)
            yf = yb.astype(jnp.float32)
            s1 = jnp.sum(yf, axis=(0, 1, 2, 3))
            s2 = jnp.sum(yf * yf, axis=(0, 1, 2, 3))
            s3 = jnp.sum(jnp.abs(yf), axis=(0, 1, 2, 3))
            return (y * 0.02, acc + s1 + s2 + s3), None
        (x, acc), _ = lax.scan(body, (x, jnp.zeros((64,))), None,
                               length=steps)
        return x, acc
    report('conv + barrier + reductions', timed(gin_barrier, x, w))

    # 4. two towers: 2 sequential convs vs one bgc=2 conv
    x2 = jax.random.normal(key, (64, 8, 56, 56, 64), jnp.bfloat16)
    w2 = jax.random.normal(key, (3, 3, 3, 64, 128), jnp.bfloat16) * 0.1

    def two_convs(x2, w2):
        def body(x2, _):
            a = conv(x2[:32], w2[..., :64])
            b = conv(x2[32:], w2[..., 64:])
            return jnp.concatenate([a, b], 0) * 0.02, None
        return lax.scan(body, x2, None, length=steps)[0]
    report('2x separate N=64 convs', timed(two_convs, x2, w2),
           flops * 2)

    def bgc_conv(x2, w2):
        def body(x2, _):
            y = lax.conv_general_dilated(
                x2, w2, (1, 1, 1), [(1, 1)] * 3, dimension_numbers=DN,
                batch_group_count=2)
            # y: (32, 8, 56, 56, 128) = [q-out | k-out]
            return jnp.concatenate([y[..., :64], y[..., 64:]],
                                   0) * 0.02, None
        return lax.scan(body, x2, None, length=steps)[0]
    report('bgc=2 packed N=128 conv', timed(bgc_conv, x2, w2),
           flops * 2)

    # 4b. block-diagonal channel packing (2x flops, N=128)
    def blockdiag(x2, w2):
        wq = jnp.pad(w2[..., :64], ((0,) * 2,) * 3 + ((0, 64), (0, 0)))
        wk = jnp.pad(w2[..., 64:], ((0,) * 2,) * 3 + ((64, 0), (0, 0)))
        wbd = jnp.concatenate([wq, wk], -1)  # (3,3,3,128,128) blockdiag
        xc = jnp.concatenate([x2[:32], x2[32:]], -1)  # (32,...,128)
        def body(xc, _):
            y = lax.conv_general_dilated(
                xc, wbd, (1, 1, 1), [(1, 1)] * 3, dimension_numbers=DN)
            return y * 0.02, None
        return lax.scan(body, xc, None, length=steps)[0]
    report('blockdiag ch-packed (2x MACs)', timed(blockdiag, x2, w2),
           flops * 2)


if __name__ == '__main__':
    main()
    import os
    os._exit(0)
