#!/usr/bin/env python
"""Pallas micro-probe: MXU rate vs K/N tile fill, VMEM-resident (round 4).

The layer1 conv class runs (M, K=64) x (64, N=64) dots at ~95 TF/s —
the nominal quarter-fill rate of the 128x128 MXU. A fused Pallas conv
could pair taps to present (M, 128) x (128, 64) dots instead, IF the
MXU rate actually doubles with K fill at N=64. XLA-level dots cannot
answer this (skinny-N dots from HBM are bandwidth-bound; the fused
kernel's operands live in VMEM) — so this kernel measures pure MXU
throughput with ALL operands VMEM-resident, iterating dots in-register.

Each case runs a grid of independent programs, each looping `inner`
dots of (M, K) x (K, N) with an f32 VMEM accumulator — mirroring the
planned conv kernel's inner loop exactly (27 taps, offset reads from a
slab, accumulate).
"""
import argparse
import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def make_probe(m, k, n, inner, steps):
    def kernel(x_ref, w_ref, o_ref, acc_ref):
        acc_ref[:] = jnp.zeros_like(acc_ref)

        def body(i, _):
            # offset reads along M, like conv taps sliding over a slab
            # (8-aligned: Mosaic requires provable sublane alignment)
            xv = x_ref[pl.ds(pl.multiple_of((i % 2) * 8, 8), m), :]
            wv = w_ref[i % inner]
            acc_ref[:] += jax.lax.dot_general(
                xv, wv, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return 0

        jax.lax.fori_loop(0, inner, body, 0)
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)

    @jax.jit
    def run(x, w):
        return pl.pallas_call(
            kernel,
            grid=(steps,),
            in_specs=[
                pl.BlockSpec((m + 8, k), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((inner, k, n), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((m, n), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((m, n), jnp.bfloat16),
            scratch_shapes=[pltpu.VMEM((m, n), jnp.float32)],
        )(x, w)

    return run


def make_probe_carry(m, mt, k, n, inner, steps):
    """Variant: per-M-tile loop with the accumulator as a loop-carried
    VALUE (not a VMEM ref RMW) — tests whether Mosaic keeps partial
    sums in registers/MXU accumulators like XLA's conv emitter does."""
    assert m % mt == 0

    def kernel(x_ref, w_ref, o_ref):
        def mtile(j, _):
            base = pl.multiple_of(j * mt, 8)

            def body(i, acc):
                # i-varying offset so Mosaic can't hoist the x read
                off = pl.multiple_of(base + (i % 2) * 8, 8)
                xv = x_ref[pl.ds(off, mt), :]
                return acc + jax.lax.dot_general(
                    xv, w_ref[i], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)

            acc = jax.lax.fori_loop(
                0, inner, body, jnp.zeros((mt, n), jnp.float32))
            o_ref[pl.ds(base, mt), :] = acc.astype(o_ref.dtype)
            return 0

        jax.lax.fori_loop(0, m // mt, mtile, 0)

    @jax.jit
    def run(x, w):
        return pl.pallas_call(
            kernel,
            grid=(steps,),
            in_specs=[
                pl.BlockSpec((m + 8, k), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((inner, k, n), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((m, n), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((m, n), jnp.bfloat16),
        )(x, w)

    return run


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--iters', type=int, default=3)
    p.add_argument('--carry', action='store_true',
                   help='loop-carried value accumulator variant')
    args = p.parse_args()
    key = jax.random.PRNGKey(0)
    M, INNER = 3248, 27
    if args.carry:
        cases = [
            ('carry mt=112 K=64  N=64 ', 112, 64, 64),
            ('carry mt=464 K=64  N=64 ', 464, 64, 64),
            ('carry mt=112 K=128 N=64 ', 112, 128, 64),
            ('carry mt=464 K=128 N=64 ', 464, 128, 64),
            ('carry mt=1624 K=128 N=64', 1624, 128, 64),
        ]
        for name, mt, k, n in cases:
            fl1 = 2 * M * k * n * INNER
            steps = max(8, int(2e13 / fl1))
            x = jax.random.normal(key, (M + 8, k), jnp.bfloat16)
            w = jax.random.normal(key, (INNER, k, n), jnp.bfloat16) * .05
            run = make_probe_carry(M, mt, k, n, INNER, steps)
            out = run(x, w)
            _ = float(jnp.sum(out.astype(jnp.float32)))
            best = 1e9
            for _ in range(args.iters):
                t0 = time.time()
                out = run(x, w)
                _ = float(jnp.sum(out.astype(jnp.float32)))
                best = min(best, time.time() - t0)
            fl = fl1 * steps
            print(f'{name} steps={steps:5d} {best * 1e3:8.2f} ms '
                  f'{fl / best / 1e12:6.1f} TF/s', flush=True)
        return
    cases = [
        ('K=64  N=64 ', 64, 64),
        ('K=128 N=64 ', 128, 64),
        ('K=256 N=64 ', 256, 64),
        ('K=128 N=128', 128, 128),
        ('K=256 N=128', 256, 128),
    ]
    for name, k, n in cases:
        # ~20 TFLOP total so the ~28 ms axon dispatch latency is <15%
        fl1 = 2 * M * k * n * INNER
        steps = max(8, int(2e13 / fl1))
        x = jax.random.normal(key, (M + 8, k), jnp.bfloat16)
        w = jax.random.normal(key, (INNER, k, n), jnp.bfloat16) * .05
        run = make_probe(M, k, n, INNER, steps)
        out = run(x, w)
        _ = float(jnp.sum(out.astype(jnp.float32)))
        best = 1e9
        for _ in range(args.iters):
            t0 = time.time()
            out = run(x, w)
            _ = float(jnp.sum(out.astype(jnp.float32)))
            best = min(best, time.time() - t0)
        fl = fl1 * steps
        print(f'{name} steps={steps:5d} {best * 1e3:8.2f} ms '
              f'{fl / best / 1e12:6.1f} TF/s', flush=True)


if __name__ == '__main__':
    main()
