"""PreciseBN — refresh BN running statistics from data after training.

Parity role: mmcv PreciseBNHook used by reference apis/train.py:127-139.
Implementation: run ``num_iters`` training-mode forwards with mutable
batch_stats; with flax's EMA-form running stats (momentum 0.9) this
converges to a data-weighted average of recent batch statistics. (The
mmcv version computes the exact mean over the window; the EMA form is the
documented approximation — equivalent in expectation for stationary
statistics.)
"""
from __future__ import annotations

import jax

from ..parallel.mesh import create_mesh, shard_batch


def precise_bn_update(model, state, loader, num_iters=200, mesh=None,
                      method='train_step'):
    mesh = mesh or create_mesh()

    @jax.jit
    def refresh(state_params, batch_stats, moco_state, batch):
        _, new_vars = model.apply(
            {'params': state_params, 'batch_stats': batch_stats,
             'moco_state': moco_state},
            batch, method=method,
            mutable=['batch_stats', 'moco_state'],
            rngs={'dropout': jax.random.PRNGKey(0),
                  'moco': jax.random.PRNGKey(0)})
        return new_vars.get('batch_stats', batch_stats)

    batch_stats = state.batch_stats
    it = iter(loader)
    for i in range(num_iters):
        try:
            batch = next(it)
        except StopIteration:
            it = iter(loader)
            batch = next(it)
        device_batch = shard_batch(batch, mesh)
        batch_stats = refresh(state.params, batch_stats,
                              state.moco_state, device_batch)
    return state.replace(batch_stats=batch_stats)
