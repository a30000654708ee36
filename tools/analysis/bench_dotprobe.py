#!/usr/bin/env python
"""Rate-probe the MXU at the layer1 im2col geometries (round 4).

The layer1 3x3x3 C=F=64 conv runs at ~95 TF/s — exactly the nominal
64x64-tile quarter-fill rate of the 128x128 MXU (v5e bf16 peak ~394).
A Pallas fused-im2col kernel would turn the conv into
dot((M, 27*64), (27*64, 64)): K full, N still 64. Whether that helps
depends on whether the MXU rate scales with K fill at N=64 — this
script measures plain XLA dots at the candidate geometries (the dot
ceiling IS the kernel's ceiling; if dot(K=1728, N=64) runs at ~95,
the kernel is dead before it is written).

Timing: the axon backend has a ~28 ms fixed dispatch+sync round-trip
(first probe version measured exactly that for every case) — so each
case is timed as the DELTA between a 2s-step and an s-step scan chain,
which cancels the fixed overhead and any constant per-call work.
"""
import time

import jax
import jax.numpy as jnp
from jax import lax


def chain_time(a, b, steps, iters=3):
    def chain(a, b):
        def body(c, _):
            y = jnp.dot(a + c, b, preferred_element_type=jnp.float32)
            # max-reduce (not slice/sum: both have dot-pushdown
            # rewrites that would gut the measured FLOPs)
            m_ = jnp.max(y).astype(jnp.bfloat16) * 1e-6
            return c * 0 + m_, None
        return lax.scan(body, jnp.zeros((1, 1), jnp.bfloat16),
                        None, length=steps)[0]
    jfn = jax.jit(chain)
    out = jfn(a, b)
    _ = float(jnp.sum(out.astype(jnp.float32)))
    best = 1e9
    for _ in range(iters):
        t0 = time.time()
        out = jfn(a, b)
        _ = float(jnp.sum(out.astype(jnp.float32)))
        best = min(best, time.time() - t0)
    return best


def main():
    key = jax.random.PRNGKey(0)
    cases = [
        # (name, M_chunk, K, N)
        ('conv-equiv  K=64   N=64 ', 100352, 64, 64),
        ('tap-pair    K=128  N=64 ', 100352, 128, 64),
        ('im2col      K=1728 N=64 ', 100352, 1728, 64),
        ('im2col+pack K=1728 N=128', 50176, 1728, 128),
        ('full-fill   K=128  N=128', 100352, 128, 128),
    ]
    for name, m, k, n in cases:
        a = jax.random.normal(key, (m, k), jnp.bfloat16)
        b = jax.random.normal(key, (k, n), jnp.bfloat16)
        # size the chain so the DELTA half is ~2 TFLOP of dot work
        s = max(8, int(2e12 / (2 * m * k * n)))
        t1 = chain_time(a, b, s)
        t2 = chain_time(a, b, 2 * s)
        dt = t2 - t1
        fl = 2 * m * k * n * s
        print(f'{name} steps={s:5d} delta={dt * 1e3:8.2f} ms '
              f'{fl / max(dt, 1e-9) / 1e12:6.1f} TF/s', flush=True)


if __name__ == '__main__':
    main()
