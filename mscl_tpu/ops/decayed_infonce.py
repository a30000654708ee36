"""Pallas TPU kernel: fused temporal-decay InfoNCE negatives.

Computes l_neg = q @ (queue * t_decay**count) without ever materializing
the decayed (C, K) weight matrix in HBM (K = 65536 -> 33 MB f32 per tower
per use; the reference materializes it and reuses it across the RGB/flow/
cross-modal losses, moco.py:483-489). The decay column scaling is fused
into the MXU matmul's epilogue-free stream: each grid step loads a
(C, BK) queue tile + (BK,) counts, scales in VMEM and feeds the MXU.

Custom VJP: the backward pass dq = g @ weight^T re-fuses the decay the
same way (queue and count carry stop_gradient semantics in the reference).

Falls back to interpret mode off-TPU so the unit tests run on CPU.

Measured on v5e (B=128, C=128, K=65536, f32): fwd 0.86 ms vs XLA 0.76 ms,
bwd 0.98 ms vs 0.72 ms — XLA's fusion already streams the decay scaling
into the matmul, so the model uses the XLA formulation by default and this
kernel stands as the validated Pallas reference (and the starting point
for a future fully-fused InfoNCE+CE+queue-update kernel).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_K = 2048


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == 'tpu'
    except Exception:
        return False


def _fwd_kernel(q_ref, queue_ref, decay_ref, out_ref):
    # q: (B, C); queue tile: (C, BK); decay tile: (1, BK)
    weight = queue_ref[:] * decay_ref[:]          # fused decay scaling
    out_ref[:] = jnp.dot(q_ref[:], weight,
                         preferred_element_type=jnp.float32)


def _bwd_kernel(g_ref, queue_ref, decay_ref, dq_ref):
    # g tile: (B, BK); queue tile: (C, BK) -> dq (B, C) accumulated
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _():
        dq_ref[:] = jnp.zeros_like(dq_ref)

    weight = queue_ref[:] * decay_ref[:]
    dq_ref[:] += jax.lax.dot_general(
        g_ref[:], weight, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)


def _pallas_l_neg(q, queue, decay, block_k, interpret):
    b, c = q.shape
    k = queue.shape[1]
    block_k = min(block_k, k)
    assert k % block_k == 0, (k, block_k)
    grid = (k // block_k,)
    return pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((b, c), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, block_k), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b, block_k), lambda j: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, k), jnp.float32),
        interpret=interpret,
    )(q, queue, decay)


def _pallas_dq(g, queue, decay, block_k, interpret):
    b, k = g.shape
    c = queue.shape[0]
    block_k = min(block_k, k)
    grid = (k // block_k,)
    return pl.pallas_call(
        _bwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((b, block_k), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, block_k), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b, c), lambda j: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, c), jnp.float32),
        interpret=interpret,
    )(g, queue, decay)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def decayed_infonce_neg(q, queue, count, t_decay: float = 0.99999,
                        block_k: int = DEFAULT_BLOCK_K,
                        interpret: Optional[bool] = None):
    """l_neg = q @ (queue * t_decay**count).

    q: (B, C) f32; queue: (C, K) f32; count: (K,) int. queue/count are
    treated as constants (stop_gradient), matching the reference's
    weight.clone().detach() (moco.py:487).
    """
    out, _ = _fwd(q, queue, count, t_decay, block_k, interpret)
    return out


def _fwd(q, queue, count, t_decay, block_k, interpret):
    if interpret is None:
        interpret = not _on_tpu()
    decay = (t_decay ** count.astype(jnp.float32))[None, :]
    out = _pallas_l_neg(q.astype(jnp.float32),
                        queue.astype(jnp.float32), decay, block_k,
                        interpret)
    return out, (queue, decay)


def _bwd(t_decay, block_k, interpret, residuals, g):
    if interpret is None:
        interpret = not _on_tpu()
    queue, decay = residuals
    dq = _pallas_dq(g.astype(jnp.float32),
                    queue.astype(jnp.float32), decay, block_k, interpret)
    return dq, None, None


decayed_infonce_neg.defvjp(_fwd, _bwd)


def decayed_infonce_neg_xla(q, queue, count, t_decay=0.99999):
    """Reference XLA formulation (used by default; the Pallas path is
    opt-in via MoCo cfg use_pallas_infonce)."""
    decay = t_decay ** count.astype(jnp.float32)
    weight = jax.lax.stop_gradient(queue * decay[None, :])
    return jnp.einsum('nc,ck->nk', q, weight), weight
