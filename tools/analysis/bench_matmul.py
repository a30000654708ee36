#!/usr/bin/env python
"""MXU calibration: bf16 matmul throughput at several sizes — the
yardstick for interpreting conv MFU numbers on this chip/runtime."""
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    print(f'devices: {jax.devices()}', file=sys.stderr, flush=True)
    rng = np.random.default_rng(0)
    for n in (2048, 4096, 8192):
        a = jnp.asarray(rng.normal(size=(n, n)), jnp.bfloat16)
        b = jnp.asarray(rng.normal(size=(n, n)), jnp.bfloat16)

        @jax.jit
        def mm(a, b):
            return jnp.dot(a, b, preferred_element_type=jnp.float32)

        out = mm(a, b)
        _ = float(out[0, 0])
        iters = 30
        t0 = time.time()
        for _ in range(iters):
            out = mm(a, b)
        _ = float(out[0, 0])
        dt = (time.time() - t0) / iters
        tf = 2 * n ** 3 / dt / 1e12
        print(f'{n}x{n}x{n} bf16: {dt * 1e3:.2f} ms  {tf:.1f} TF/s',
              flush=True)


if __name__ == '__main__':
    main()
    import os
    os._exit(0)
