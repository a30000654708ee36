"""BatchNorm with a consumer-side-split backward (TPU fusion control).

Motivation (docs/benchmark.md round-2/3 conv dossier): in the MSCL step
the four layer1 grad-input conv fusions run at 48 TF/s vs 92 forward
because XLA fuses the *consumer* BN-backward graph — the d_scale/d_bias
and dx-statistics reduces over the 51M-element cotangent — into the
transposed-conv fusion. All six round-2/3 rewrites attacked the
*producer* side (barrier the conv's input cotangent, forward-form
rewrites, multi-output ties) and lost or tied: materializing the conv's
INPUT costs real HBM, and the emitter itself was never the problem.

This module attacks the consumer side instead: an analytic custom-VJP
BatchNorm whose backward computes the batch reductions from
``optimization_barrier``-detached copies of (dy, xhat). The barrier
splits the reduces into their own fusion that re-reads dy from HBM —
where dy is already materialized anyway (the dx elementwise pass and the
grad-weight conv read it too) — leaving the grad-input conv fusion pure.

Forward math mirrors flax ``nn.BatchNorm`` exactly (stats in f32,
normalization in the compute dtype, f32 params/running stats, biased
batch variance, same momentum semantics), so it is checkpoint- and
numerics-compatible with the default BN; only the backward *schedule*
differs. Select with ``MSCL_BN_IMPL=split`` (see ops/conv3d.py for the
same env-switch pattern).
"""
from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax import lax


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def bn_train_apply(x, scale, bias, eps, barrier=True):
    """Train-mode BN normalize (batch statistics), flax-equivalent
    forward, analytic backward with f32-accumulated reductions —
    ``optimization_barrier``-detached when ``barrier`` (SplitBatchNorm),
    freely schedulable otherwise (LowPrecisionBatchNorm)."""
    y, _ = _bn_forward(x, scale, bias, eps)
    return y


def _bn_forward(x, scale, bias, eps):
    axes = tuple(range(x.ndim - 1))
    xf = x.astype(jnp.float32)
    mean32 = xf.mean(axes)
    var32 = (xf * xf).mean(axes) - mean32 * mean32
    dt = x.dtype
    m = mean32.astype(dt)
    # rsqrt in f32 ([C]-sized, free) so eps survives and train matches
    # the eval path's f32 statistics math; only the per-element
    # normalize rounds to the compute dtype.
    rstd = lax.rsqrt(var32 + eps).astype(dt)
    y = (x - m) * rstd * scale.astype(dt) + bias.astype(dt)
    return y, (x, scale, m, rstd)


def _bn_fwd(x, scale, bias, eps, barrier=True):
    return _bn_forward(x, scale, bias, eps)


def _bn_bwd(eps, barrier, res, dy):
    x, scale, m, rstd = res
    dt = x.dtype
    axes = tuple(range(x.ndim - 1))
    n = x.size // x.shape[-1]
    xhat = (x - m) * rstd
    # Detach the reduction operands: the sums over the 4D/5D cotangent
    # must not become consumers inside the producing (transposed-conv)
    # fusion. dy is multi-consumer (dx elementwise + grad-weight conv)
    # and therefore HBM-materialized regardless; the barrier only moves
    # the reduces into a separate re-reading fusion.
    if barrier:
        dyb, xhatb = lax.optimization_barrier((dy, xhat))
    else:
        dyb, xhatb = dy, xhat
    s1 = dyb.astype(jnp.float32).sum(axes)                 # = d_bias
    s2 = (dyb.astype(jnp.float32) *
          xhatb.astype(jnp.float32)).sum(axes)             # = d_scale
    k = scale.astype(dt) * rstd
    dx = k * (dy - (s1 / n).astype(dt) - xhat * (s2 / n).astype(dt))
    return dx.astype(x.dtype), s2, s1


bn_train_apply.defvjp(_bn_fwd, _bn_bwd)


class LowPrecisionBatchNorm(nn.Module):
    """``nn.BatchNorm``-compatible BN that keeps statistics in f32 but
    performs the per-element normalization in the input dtype, with the
    scale/offset folded to one multiply-add.

    Why (v5e profile, round 3): flax promotes the whole input to f32
    before normalizing, so wherever the promoted tensor cannot stay
    inside a fusion it materializes at DOUBLE width — at the tap2d stem
    the required 2D->5D relayout copy rides the f32 convert (2x ~0.7 ms
    of the step's hot copies), and the BN elementwise/backward fusions
    carry f32 operands. Here the f32 tensor feeds ONLY the stat reduces
    (which XLA fuses convert-into-reduce, as in layer1), while the
    normalize reads bf16 x: y = x*A + B with A = scale*rstd and
    B = bias - mean*A folded in f32 then cast once ([C]-sized).

    In f32 models this is arithmetically identical to flax up to the
    scale/offset folding; in bf16 it changes only the rounding of the
    normalize (stats, params, running averages stay f32). Backward is
    plain autodiff — no custom VJP, XLA schedules freely (contrast
    SplitBatchNorm below). Select with ``MSCL_BN_IMPL=lp``.
    """
    use_running_average: bool = False
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Any = jnp.float32
    scale_init: Any = nn.initializers.ones
    bias_init: Any = nn.initializers.zeros

    @nn.compact
    def __call__(self, x, use_running_average: bool | None = None):
        use_ra = (self.use_running_average if use_running_average is None
                  else use_running_average)
        c = x.shape[-1]
        scale = self.param('scale', self.scale_init, (c,), jnp.float32)
        bias = self.param('bias', self.bias_init, (c,), jnp.float32)
        ra_mean = self.variable('batch_stats', 'mean',
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable('batch_stats', 'var',
                               lambda: jnp.ones((c,), jnp.float32))
        # honor the flax `dtype` result-dtype semantics: call sites that
        # pass dtype=f32 on a bf16 input are asking for f32 normalize +
        # f32 output (e.g. explicit-f32 BN blocks); compute in the
        # PROMOTED dtype (never narrow the stats input), return
        # `self.dtype`.
        if self.dtype is not None:
            ct = jnp.promote_types(x.dtype, self.dtype)
            if x.dtype != ct:
                x = x.astype(ct)
        dt = x.dtype
        out_dt = self.dtype or dt
        if use_ra:
            a32 = scale * lax.rsqrt(ra_var.value + self.epsilon)
            b32 = bias - ra_mean.value * a32
            return (x * a32.astype(dt) + b32.astype(dt)).astype(out_dt)
        # train path: custom-VJP apply so the BACKWARD batch reductions
        # accumulate in f32 (plain autodiff of a bf16 normalize leaves
        # bf16-accumulated reduces over the 51M-element cotangent —
        # observed in the step HLO); the f32 converts fuse into the
        # reduces, so HBM reads stay bf16.
        y = bn_train_apply(x, scale, bias, self.epsilon, False)
        if not self.is_initializing():
            axes = tuple(range(x.ndim - 1))
            xf = lax.stop_gradient(x).astype(jnp.float32)
            mean32 = xf.mean(axes)
            var32 = (xf * xf).mean(axes) - mean32 * mean32
            ra_mean.value = (self.momentum * ra_mean.value +
                             (1. - self.momentum) * mean32)
            ra_var.value = (self.momentum * ra_var.value +
                            (1. - self.momentum) * var32)
        return y.astype(out_dt)


def make_bn(**kwargs):
    """BatchNorm factory for backbone/neck call sites: returns
    ``LowPrecisionBatchNorm`` (the measured-faster default, see class
    docstring) or flax ``nn.BatchNorm`` under ``MSCL_BN_IMPL=flax``.
    Accepts the standard flax BN kwargs (use_running_average, momentum,
    epsilon, dtype, name)."""
    import os
    if os.environ.get('MSCL_BN_IMPL', 'lp') == 'lp':
        return LowPrecisionBatchNorm(**kwargs)
    return nn.BatchNorm(**kwargs)


class SplitBatchNorm(nn.Module):
    """Drop-in for ``nn.BatchNorm`` (same param/stat names and dtypes)
    with the split-backward train path. Under pjit/GSPMD the batch
    reductions still span the sharded batch axis (global-batch BN)."""
    use_running_average: bool = False
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, use_running_average: bool | None = None):
        use_ra = (self.use_running_average if use_running_average is None
                  else use_running_average)
        c = x.shape[-1]
        scale = self.param('scale', nn.initializers.ones, (c,),
                           jnp.float32)
        bias = self.param('bias', nn.initializers.zeros, (c,),
                          jnp.float32)
        ra_mean = self.variable('batch_stats', 'mean',
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable('batch_stats', 'var',
                               lambda: jnp.ones((c,), jnp.float32))
        if use_ra:
            dt = x.dtype
            rstd = lax.rsqrt(ra_var.value.astype(dt) +
                             jnp.asarray(self.epsilon, dt))
            return ((x - ra_mean.value.astype(dt)) * rstd *
                    scale.astype(dt) + bias.astype(dt))
        y = bn_train_apply(x, scale, bias, self.epsilon, True)
        if not self.is_initializing():
            axes = tuple(range(x.ndim - 1))
            xf = lax.stop_gradient(x).astype(jnp.float32)
            mean32 = xf.mean(axes)
            var32 = (xf * xf).mean(axes) - mean32 * mean32
            ra_mean.value = (self.momentum * ra_mean.value +
                             (1. - self.momentum) * mean32)
            ra_var.value = (self.momentum * ra_var.value +
                            (1. - self.momentum) * var32)
        return y
