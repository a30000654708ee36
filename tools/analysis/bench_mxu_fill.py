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

import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# MSCL_MLIR_DEBUG=1 prints each probe's Mosaic tpu-dialect module at
# lowering (works on the CPU box via lowering_platforms=('tpu',)) —
# the round-5 assembly-level study cites these.
_DEBUG = bool(int(os.environ.get('MSCL_MLIR_DEBUG', '0')))


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
            debug=_DEBUG,
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
            debug=_DEBUG,
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


def make_probe_bigdot(m, k, n, steps):
    """Ceiling probe: ONE dot of (M, K) x (K, N), all VMEM-resident.

    A single tpu.matmul lets Mosaic chain the K dimension through the
    MXU's internal accumulators (output-stationary) the way XLA's conv
    emitter does — no per-tap f32 VMEM RMW. K here is the CONCATENATED
    im2col K (e.g. 27 taps x 64 ch = 1728): if this probe reaches the
    emitter's ~95 TF/s at N=64, the tap loop's 37.5 was accumulate
    serialization, not an MXU fill limit."""
    def kernel(x_ref, w_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(o_ref.dtype)

    @jax.jit
    def run(x, w):
        return pl.pallas_call(
            kernel,
            debug=_DEBUG,
            grid=(steps,),
            in_specs=[
                pl.BlockSpec((m, k), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((k, n), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((m, n), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((m, n), jnp.bfloat16),
        )(x, w)

    return run


def make_probe_imcat(m, k, n, inner, steps):
    """Fused-im2col probe: build the K-concatenated patch slab in VMEM
    (inner taps, each an offset read of the input slab, lane-concated
    in pairs so every store is 128-lane aligned), then ONE big dot.
    Measures the bigdot rate MINUS the real VPU patch-build cost."""
    assert inner % 2 == 0, 'pad taps to even (zero-pad the weight)'
    kcat = inner * k

    def kernel(x_ref, w_ref, o_ref, xcat_ref):
        def build(j, _):
            # both reads vary with j (offsets 0/8 alternating) so
            # Mosaic can't hoist either out of the loop
            a = x_ref[pl.ds(pl.multiple_of((j % 2) * 8, 8), m), :]
            b = x_ref[pl.ds(pl.multiple_of(((j + 1) % 2) * 8, 8), m), :]
            xcat_ref[:, pl.ds(pl.multiple_of(j * 2 * k, 128), 2 * k)] = (
                jnp.concatenate([a, b], axis=-1))
            return 0

        jax.lax.fori_loop(0, inner // 2, build, 0)
        o_ref[:] = jax.lax.dot_general(
            xcat_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(o_ref.dtype)

    @jax.jit
    def run(x, w):
        return pl.pallas_call(
            kernel,
            debug=_DEBUG,
            grid=(steps,),
            in_specs=[
                pl.BlockSpec((m + 8, k), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((kcat, n), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((m, n), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((m, n), jnp.bfloat16),
            scratch_shapes=[pltpu.VMEM((m, kcat), jnp.bfloat16)],
        )(x, w)

    return run


def make_probe_paircat(m, k, n, inner, steps):
    """Tap-pair probe: inner/2 dots of (M, 2K) x (2K, N) where each lhs
    is an INLINE lane-concat of two offset reads (no materialized
    im2col — the concat feeds the matmul directly). Halves the number
    of f32 accumulator RMWs vs the tap loop AND doubles K fill; tests
    whether Mosaic keeps the concat in vregs."""
    assert inner % 2 == 0

    def kernel(x_ref, w_ref, o_ref, acc_ref):
        acc_ref[:] = jnp.zeros_like(acc_ref)

        def body(i, _):
            a = x_ref[pl.ds(pl.multiple_of((i % 2) * 8, 8), m), :]
            b = x_ref[pl.ds(pl.multiple_of(((i + 1) % 2) * 8, 8), m), :]
            xv = jnp.concatenate([a, b], axis=-1)
            acc_ref[:] += jax.lax.dot_general(
                xv, w_ref[i], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return 0

        jax.lax.fori_loop(0, inner // 2, body, 0)
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)

    @jax.jit
    def run(x, w):
        return pl.pallas_call(
            kernel,
            debug=_DEBUG,
            grid=(steps,),
            in_specs=[
                pl.BlockSpec((m + 8, k), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((inner // 2, 2 * k, n), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((m, n), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((m, n), jnp.bfloat16),
            scratch_shapes=[pltpu.VMEM((m, n), jnp.float32)],
        )(x, w)

    return run


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--iters', type=int, default=3)
    p.add_argument('--carry', action='store_true',
                   help='loop-carried value accumulator variant')
    p.add_argument('--kchain', action='store_true',
                   help='round-5 K-concat variants: bigdot / imcat / '
                        'paircat at the layer1 im2col geometry')
    args = p.parse_args()
    key = jax.random.PRNGKey(0)
    M, INNER = 3248, 27
    if args.kchain:
        # 27 taps padded to 28 so every lane-concat pair is full;
        # useful-FLOP fraction is 27/28 (-3.6%), reported rate is raw.
        inner = 28
        cases = []
        for kk in (448, 896, 1792):  # saturation curve: 7/14/28 taps
            cases.append((f'bigdot  K={kk:4d} N=64 ', 'bigdot', kk, 64))
        cases += [
            ('bigdot  K=1792 N=128', 'bigdot', 1792, 128),
            ('imcat   28x64  N=64 ', 'imcat', 64, 64),
            ('imcat   28x64  N=128', 'imcat', 64, 128),
            ('paircat 14x128 N=64 ', 'paircat', 64, 64),
            ('paircat 14x128 N=128', 'paircat', 64, 128),
        ]
        for name, mode, k, n in cases:
            if mode == 'bigdot':
                fl1 = 2 * M * k * n
                steps = max(8, int(2e13 / fl1))
                x = jax.random.normal(key, (M, k), jnp.bfloat16)
                w = jax.random.normal(key, (k, n), jnp.bfloat16) * .05
                run = make_probe_bigdot(M, k, n, steps)
            elif mode == 'imcat':
                fl1 = 2 * M * k * n * inner
                steps = max(8, int(2e13 / fl1))
                x = jax.random.normal(key, (M + 8, k), jnp.bfloat16)
                w = jax.random.normal(
                    key, (inner * k, n), jnp.bfloat16) * .05
                run = make_probe_imcat(M, k, n, inner, steps)
            else:
                fl1 = 2 * M * k * n * inner
                steps = max(8, int(2e13 / fl1))
                x = jax.random.normal(key, (M + 8, k), jnp.bfloat16)
                w = jax.random.normal(
                    key, (inner // 2, 2 * k, n), jnp.bfloat16) * .05
                run = make_probe_paircat(M, k, n, inner, steps)
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
