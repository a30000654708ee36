"""Lane-folded BatchNorm for thin-channel activations on TPU.

Profiling the MSCL step (tools/analysis/profile_step.py) shows the BN
statistics reductions over layer1-sized activations ((32,8,56,56,64)
bf16) costing ~1.9 ms EACH (8 instances = 15 ms/step): with C=64 the
per-channel reduce uses only half of the VPU's 128 lanes.

FastBatchNorm reshapes (..., W, C) -> (..., W/fold, fold*C) — a free
relayout in linear memory — so the reduction (and its backward, and the
normalize elementwise) runs with full lanes, then folds the partial
sums: channel_sum[c] = sum_f lane_sum[f*C + c]. Numerics are identical
(same adds, different association). Parameters/stats keep flax
nn.BatchNorm's names/shapes (scale/bias, batch_stats mean/var), so the
module is checkpoint-compatible and swaps in under the existing 'bn'
scope.
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn


class FastBatchNorm(nn.Module):
    use_running_average: bool = False
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, use_running_average: bool = None):
        use_ra = (self.use_running_average
                  if use_running_average is None else
                  use_running_average)
        c = x.shape[-1]
        scale = self.param('scale', nn.initializers.ones, (c,),
                           jnp.float32)
        bias = self.param('bias', nn.initializers.zeros, (c,),
                          jnp.float32)
        ra_mean = self.variable('batch_stats', 'mean',
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable('batch_stats', 'var',
                               lambda: jnp.ones((c,), jnp.float32))

        # fold minor spatial positions into lanes while it divides
        # evenly and stays within one 128-lane vector
        fold = 1
        if x.ndim >= 2 and c < 128:
            fold = 128 // c
            while fold > 1 and x.shape[-2] % fold != 0:
                fold //= 2
        if use_ra:
            mean = ra_mean.value
            var = ra_var.value
        else:
            n_elems = x.size // c
            if fold > 1:
                xf = x.reshape(x.shape[:-2] +
                               (x.shape[-2] // fold, fold * c))
                xf32 = xf.astype(jnp.float32)
                axes = tuple(range(xf.ndim - 1))
                s = jnp.sum(xf32, axis=axes)          # (fold*c,)
                s2 = jnp.sum(xf32 * xf32, axis=axes)
                s = s.reshape(fold, c).sum(axis=0)
                s2 = s2.reshape(fold, c).sum(axis=0)
            else:
                xf32 = x.astype(jnp.float32)
                axes = tuple(range(x.ndim - 1))
                s = jnp.sum(xf32, axis=axes)
                s2 = jnp.sum(xf32 * xf32, axis=axes)
            mean = s / n_elems
            var = jnp.maximum(s2 / n_elems - mean * mean, 0.0)
            if not self.is_initializing():
                ra_mean.value = (self.momentum * ra_mean.value +
                                 (1 - self.momentum) * mean)
                ra_var.value = (self.momentum * ra_var.value +
                                (1 - self.momentum) * var)

        mul = (scale / jnp.sqrt(var + self.epsilon)).astype(self.dtype)
        add = (bias - mean * scale /
               jnp.sqrt(var + self.epsilon)).astype(self.dtype)
        if fold > 1:
            # apply on the folded view too so the backward's d(scale)/
            # d(bias) reductions also run with full lanes
            xf = x.reshape(x.shape[:-2] +
                           (x.shape[-2] // fold, fold * c))
            mul_f = jnp.tile(mul, fold)
            add_f = jnp.tile(add, fold)
            y = xf.astype(self.dtype) * mul_f + add_f
            return y.reshape(x.shape)
        return x.astype(self.dtype) * mul + add
