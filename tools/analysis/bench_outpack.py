#!/usr/bin/env python
"""A/B the OUTPUT space-to-depth conv packing hypothesis (round 4).

The layer1 conv class (3x3x3, 64->64, 56^2, bs32) runs at 92-94 TF/s —
93% of the N=64 MXU half-fill ceiling (docs/benchmark.md). Input-side
packing failed twice: s2d's fold transpose ate the win, block-diagonal
doubled the MACs. This tests packing the OUTPUT width instead: two
adjacent output pixels become 128 output channels,

    y[b,t,h,2*w2+p, c] == y'[b,t,h,w2, 64*p+c]
    y' = conv(x, w', stride=(1,1,2), pad=(1,1,1)),  w'[3,3,4,64,128]
    w'[:, :, 0:3, :,   0:64 ] = w   (p=0 taps at dw'=0,1,2)
    w'[:, :, 1:4, :, 64:128 ] = w   (p=1 taps at dw'=1,2,3)

The INPUT is untouched (unlike s2d), the kernel grows 3->4 in width
(+33% MACs, 25% structural zeros), and N=128 fills the MXU lanes — the
round-2 block-diag micro measured N=128 at 2.27x the per-MAC rate, so
the expected net is ~1.7x. The output needs one (W/2,128)->(W,64)
relayout, which XLA may fold into the consumer.

Run on the real TPU: python tools/analysis/bench_outpack.py
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
    jfn = jax.jit(fn)
    out = jfn(*args)
    _ = float(jnp.sum(out[0] if isinstance(out, tuple) else out))
    best = 1e9
    for _ in range(iters):
        t0 = time.time()
        out = jfn(*args)
        _ = float(jnp.sum(out[0] if isinstance(out, tuple) else out))
        best = min(best, time.time() - t0)
    return best


def pack_w(w):
    """(3,3,3,C,F) -> (3,3,4,C,2F) output-W-packed kernel."""
    kt, kh, kw, c, f = w.shape
    z = jnp.zeros((kt, kh, 1, c, f), w.dtype)
    p0 = jnp.concatenate([w, z], axis=2)   # taps at dw'=0,1,2
    p1 = jnp.concatenate([z, w], axis=2)   # taps at dw'=1,2,3
    return jnp.concatenate([p0, p1], axis=4)


def pack_t(w):
    """(3,3,3,C,F) -> (4,3,3,C,2F) output-T-packed kernel."""
    kt, kh, kw, c, f = w.shape
    z = jnp.zeros((1, kh, kw, c, f), w.dtype)
    p0 = jnp.concatenate([w, z], axis=0)
    p1 = jnp.concatenate([z, w], axis=0)
    return jnp.concatenate([p0, p1], axis=4)


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--steps', type=int, default=20)
    p.add_argument('--iters', type=int, default=3)
    args = p.parse_args()
    steps = args.steps
    key = jax.random.PRNGKey(0)
    B, T, H, W, C = 32, 8, 56, 56, 64
    x = jax.random.normal(key, (B, T, H, W, C), jnp.bfloat16)
    w = jax.random.normal(key, (3, 3, 3, C, C), jnp.bfloat16) * 0.1
    flops = 2 * B * T * H * W * C * C * 27 * steps

    def report(name, t, fl=flops):
        print(f'{name:36s} {t * 1e3:8.2f} ms  {fl / t / 1e12:6.1f} TF/s',
              flush=True)

    def fwd_chain(x, w):
        def body(x, _):
            y = lax.conv_general_dilated(x, w, (1, 1, 1), [(1, 1)] * 3,
                                         dimension_numbers=DN)
            return y * 0.02, None
        return lax.scan(body, x, None, length=steps)[0]
    report('baseline fwd chain', timed(fwd_chain, x, w,
                                       iters=args.iters))

    def outpack_w_chain(x, w):
        wp = pack_w(w)
        def body(x, _):
            y = lax.conv_general_dilated(
                x, wp, (1, 1, 2), [(1, 1), (1, 1), (1, 1)],
                dimension_numbers=DN)
            y = y.reshape(B, T, H, W // 2, 2, C).reshape(B, T, H, W, C)
            return y * 0.02, None
        return lax.scan(body, x, None, length=steps)[0]
    report('outpack-W fwd chain', timed(outpack_w_chain, x, w,
                                        iters=args.iters))

    def outpack_t_chain(x, w):
        wp = pack_t(w)
        def body(x, _):
            y = lax.conv_general_dilated(
                x, wp, (2, 1, 1), [(1, 1), (1, 1), (1, 1)],
                dimension_numbers=DN)
            # (B, T/2, H, W, 2C): channel n = 64*p + c, p = t%2
            y = y.reshape(B, T // 2, H, W, 2, C).transpose(
                0, 1, 4, 2, 3, 5).reshape(B, T, H, W, C)
            return y * 0.02, None
        return lax.scan(body, x, None, length=steps)[0]
    report('outpack-T fwd chain', timed(outpack_t_chain, x, w,
                                        iters=args.iters))

    # exactness check (f32, small, ONE jit — eager is pathological on axon)
    @jax.jit
    def _exact(xs, ws):
        ref = lax.conv_general_dilated(xs, ws, (1, 1, 1), [(1, 1)] * 3,
                                       dimension_numbers=DN)
        yp = lax.conv_general_dilated(xs, pack_w(ws), (1, 1, 2),
                                      [(1, 1)] * 3, dimension_numbers=DN)
        yp = yp.reshape(2, 4, 8, 4, 2, 8).reshape(2, 4, 8, 8, 8)
        yt = lax.conv_general_dilated(xs, pack_t(ws), (2, 1, 1),
                                      [(1, 1)] * 3, dimension_numbers=DN)
        yt = yt.reshape(2, 2, 8, 8, 2, 8).transpose(0, 1, 4, 2, 3, 5)
        return ref, yp, yt.reshape(2, 4, 8, 8, 8)

    xs = jax.random.normal(key, (2, 4, 8, 8, 8), jnp.float32)
    ws = jax.random.normal(key, (3, 3, 3, 8, 8), jnp.float32) * 0.1
    ref, yp, yt = jax.device_get(_exact(xs, ws))
    np.testing.assert_allclose(yp, ref, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(yt, ref, rtol=1e-5, atol=1e-5)
    print('exactness: outpack-W and outpack-T match plain conv')

    # backward rates: value+grad of a short chain
    def loss_base(x, w):
        def body(x, _):
            y = lax.conv_general_dilated(x, w, (1, 1, 1), [(1, 1)] * 3,
                                         dimension_numbers=DN)
            return y * 0.02, None
        return jnp.sum(lax.scan(body, x, None, length=steps)[0]
                       .astype(jnp.float32))

    def loss_pack(x, w):
        wp = pack_w(w)
        def body(x, _):
            y = lax.conv_general_dilated(
                x, wp, (1, 1, 2), [(1, 1)] * 3, dimension_numbers=DN)
            y = y.reshape(B, T, H, W // 2, 2, C).reshape(B, T, H, W, C)
            return y * 0.02, None
        return jnp.sum(lax.scan(body, x, None, length=steps)[0]
                       .astype(jnp.float32))

    gflops = 3 * flops  # fwd + grad-input + grad-weight
    report('baseline fwd+bwd chain',
           timed(jax.grad(loss_base, argnums=(0, 1)), x, w,
                 iters=args.iters), gflops)
    report('outpack-W fwd+bwd chain',
           timed(jax.grad(loss_pack, argnums=(0, 1)), x, w,
                 iters=args.iters), gflops)


if __name__ == '__main__':
    main()
