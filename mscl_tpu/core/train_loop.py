"""Functional train step + epoch runner.

TPU-native replacement for mmcv EpochBasedRunner + hooks (reference
apis/train.py:18-238): one pure jitted train step over a DP mesh
(state replicated, batch sharded), an epoch loop with text/json logging,
checkpointing, LR schedule and eval hooks as plain code instead of a hook
registry. The whole TrainState (params, BN stats, MoCo queue, momentum
iter counter, optimizer state, RNG) is an explicit pytree — checkpoints
capture everything and resume is exact.
"""
from __future__ import annotations

import json
import os
import os.path as osp
import signal
import threading
import time
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from ..parallel.mesh import batch_sharding, create_mesh, replicated, \
    shard_batch
from .checkpoint import latest_checkpoint, load_checkpoint, load_meta, \
    save_checkpoint


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    moco_state: Any          # {} for plain classifiers
    opt_state: Any
    rng: Any


def init_state(model, tx, example_batch, rng=None, method='train_step',
               post_init_fn: Optional[Callable] = None) -> TrainState:
    """Initialize model variables from an example batch and wrap in
    TrainState. post_init_fn(variables) -> variables runs once after init
    (the MoCo q->k weight copy, reference moco.py:379-387)."""
    rng = jax.random.PRNGKey(0) if rng is None else rng
    init_rng, state_rng = jax.random.split(rng)

    # jit the whole init: eager init dispatches every op separately,
    # which is pathologically slow on remote-compile TPU backends
    @jax.jit
    def _init(r, batch):
        return model.init({'params': r, 'dropout': r, 'moco': r},
                          batch, method=method)

    variables = _init(init_rng, example_batch)
    if post_init_fn is not None:
        variables = post_init_fn(variables)
    params = variables['params']
    batch_stats = variables.get('batch_stats', {})
    moco_state = variables.get('moco_state', {})
    opt_state = tx.init(params)
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      batch_stats=batch_stats, moco_state=moco_state,
                      opt_state=opt_state, rng=state_rng)


def make_train_step(model, tx,
                    pre_update_fn: Optional[Callable] = None,
                    method: str = 'train_step',
                    update: bool = True) -> Callable:
    """Build the pure (state, batch) -> (state, log_vars) step.

    pre_update_fn(params, moco_state) -> params runs BEFORE the forward —
    the MoCo EMA key-encoder copy lives there (matching the reference's
    order: momentum update precedes the key forward, moco.py:528-530).
    """

    def train_step(state: TrainState, batch) -> tuple:
        rng, dropout_rng, moco_rng = jax.random.split(state.rng, 3)

        base_params = state.params
        if pre_update_fn is not None:
            base_params = pre_update_fn(base_params, state.moco_state)

        def loss_fn(params):
            variables = {'params': params,
                         'batch_stats': state.batch_stats,
                         'moco_state': state.moco_state}
            (loss, log_vars), new_vars = model.apply(
                variables, batch, method=method,
                mutable=['batch_stats', 'moco_state'],
                rngs={'dropout': dropout_rng, 'moco': moco_rng})
            return loss, (log_vars, new_vars)

        if update:
            grads, (log_vars, new_vars) = jax.grad(
                loss_fn, has_aux=True)(base_params)
            updates, new_opt_state = tx.update(grads, state.opt_state,
                                               base_params)
            params = optax.apply_updates(base_params, updates)
            state = state.replace(
                step=state.step + 1,
                params=params,
                batch_stats=new_vars.get('batch_stats',
                                         state.batch_stats),
                moco_state=new_vars.get('moco_state', state.moco_state),
                opt_state=new_opt_state,
                rng=rng)
        else:
            # validation-by-loss: run the same computation, no update
            # (SimpleDistEvalHook, reference eval_hooks.py:417-529)
            _, (log_vars, _) = loss_fn(base_params)
            state = state.replace(rng=rng)
        return state, log_vars

    return train_step


class Runner:
    """Epoch-based training driver (reference EpochBasedRunner + hooks)."""

    def __init__(self, model, tx, train_loader, cfg, work_dir,
                 val_loader=None, val_dataset=None,
                 pre_update_fn=None, mesh=None,
                 lr_schedule=None, eval_fn=None):
        self.model = model
        self.tx = tx
        self.train_loader = train_loader
        self.cfg = cfg
        self.work_dir = work_dir
        self.val_loader = val_loader
        self.val_dataset = val_dataset
        self.lr_schedule = lr_schedule
        self.eval_fn = eval_fn
        self.mesh = mesh or create_mesh()

        self.total_epochs = cfg.get('total_epochs', 1)
        self.log_interval = cfg.get('log_config', {}).get('interval', 20)
        self.ckpt_interval = cfg.get('checkpoint_config', {}).get(
            'interval', 1)
        eval_cfg = cfg.get('evaluation', {}) or {}
        self.eval_interval = eval_cfg.get('interval', 0)
        self.eval_simple = eval_cfg.get('simple', False)
        self.eval_metrics = eval_cfg.get(
            'metrics', ['top_k_accuracy'])
        # save_best semantics (reference core/evaluation/eval_hooks.py:
        # 51-416): track a key metric across validations and keep a
        # best_* checkpoint. rule inferred from the key when not given.
        self.save_best = eval_cfg.get('save_best')
        rule = eval_cfg.get('rule')
        if rule is None and self.save_best:
            less_keys = ('loss',)
            rule = 'less' if any(k in self.save_best
                                 for k in less_keys) else 'greater'
        self.best_rule = rule
        self.best_score = None
        self.best_ckpt_path = None
        # PreciseBNHook wiring (reference apis/train.py:127-139 +
        # slowfast_prebn configs: precise_bn=dict(num_iters=200,
        # interval=1)) — refresh BN running stats from train data after
        # each `interval` epochs, via core/precise_bn.py.
        self.precise_bn = dict(cfg.get('precise_bn') or {}) or None

        rep = replicated(self.mesh)
        bsh = batch_sharding(self.mesh)
        self._train_step = jax.jit(
            make_train_step(model, tx, pre_update_fn),
            donate_argnums=0)
        self._val_step = jax.jit(
            make_train_step(model, tx, pre_update_fn, update=False))
        os.makedirs(work_dir, exist_ok=True)
        self.log_file = osp.join(work_dir, 'log.json')
        self.epoch = 0

        # Preemption-safe checkpointing (beyond the reference, which has
        # no failure handling — SURVEY §5): on SIGTERM (the TPU-pod /
        # cluster preemption signal) finish the in-flight step, write a
        # resume-able checkpoint, and exit 143. Opt out with
        # cfg.preempt_checkpoint=False.
        self._preempt_signum = None
        if cfg.get('preempt_checkpoint', True) and \
                threading.current_thread() is threading.main_thread():
            try:
                signal.signal(signal.SIGTERM, self._note_preempt)
            except (ValueError, OSError):  # non-main thread / platform
                pass

    def _note_preempt(self, signum, frame):
        self._preempt_signum = signum

    def log(self, record: Dict):
        record = {k: (float(v) if hasattr(v, 'dtype') or
                      isinstance(v, (int, float, np.generic)) else v)
                  for k, v in record.items()}
        line = json.dumps(record)
        print(line, flush=True)
        with open(self.log_file, 'a') as f:
            f.write(line + '\n')

    def resume(self, state: TrainState, path: Optional[str] = None
               ) -> TrainState:
        path = path or latest_checkpoint(self.work_dir)
        if path is None:
            return state
        ckpt = load_checkpoint(path)
        from flax import serialization
        state = serialization.from_state_dict(state, ckpt)
        self.epoch = load_meta(path).get('epoch', 0)
        print(f'resumed from {path} at epoch {self.epoch}')
        return state

    def run(self, state: TrainState) -> TrainState:
        while self.epoch < self.total_epochs:
            state = self.train_epoch(state)
            self.epoch += 1
            if self.precise_bn and self.epoch % self.precise_bn.get(
                    'interval', 1) == 0:
                from .precise_bn import precise_bn_update
                state = precise_bn_update(
                    self.model, state, self.train_loader,
                    num_iters=self.precise_bn.get('num_iters', 200),
                    mesh=self.mesh)
            if self.ckpt_interval and \
                    self.epoch % self.ckpt_interval == 0:
                save_checkpoint(_state_to_dict(state), self.work_dir,
                                self.epoch)
            if self.eval_interval and \
                    self.epoch % self.eval_interval == 0:
                state = self.validate(state)
        # final checkpoint if not on an interval boundary
        if not self.ckpt_interval or self.epoch % self.ckpt_interval:
            save_checkpoint(_state_to_dict(state), self.work_dir,
                            self.epoch)
        return state

    def train_epoch(self, state: TrainState) -> TrainState:
        self.train_loader.set_epoch(self.epoch)
        n_batches = len(self.train_loader)
        if n_batches == 0:
            print(f'WARNING: epoch {self.epoch + 1} has 0 batches — '
                  f'dataset ({len(self.train_loader.dataset)} samples) '
                  f'is smaller than the global batch '
                  f'({self.train_loader.batch_size}) with drop_last',
                  flush=True)
        t_end = time.time()
        it = iter(self.train_loader)
        try:
            for i, batch in enumerate(it):
                data_time = time.time() - t_end
                device_batch = shard_batch(batch, self.mesh)
                state, log_vars = self._train_step(state, device_batch)
                if (i + 1) % self.log_interval == 0 or i + 1 == n_batches:
                    log_vars = jax.device_get(log_vars)
                    step = int(jax.device_get(state.step))
                    lr = float(self.lr_schedule(step)) if self.lr_schedule \
                        else None
                    iter_time = time.time() - t_end
                    self.log(dict(mode='train', epoch=self.epoch + 1,
                                  iter=i + 1, total_iters=n_batches, lr=lr,
                                  time=iter_time, data_time=data_time,
                                  **log_vars))
                if self._preempt_signum is not None:
                    # meta epoch = completed epochs, so resume re-runs
                    # the interrupted epoch; the step counter / queue /
                    # EMA inside the state are exact
                    path = save_checkpoint(
                        _state_to_dict(state), self.work_dir, self.epoch,
                        meta=dict(preempted=True, iter=i + 1),
                        prefix='preempt_')
                    with open(osp.join(self.work_dir, 'latest'),
                              'w') as f:
                        f.write(osp.basename(path))
                    self.log(dict(mode='preempt', epoch=self.epoch + 1,
                                  iter=i + 1, checkpoint=path))
                    raise SystemExit(128 + int(self._preempt_signum))
                t_end = time.time()
        finally:
            if hasattr(it, 'close'):
                it.close()  # stop the prefetch producer on early exit
        return state

    def validate(self, state: TrainState) -> TrainState:
        if self.val_loader is None:
            return state
        metrics = None
        if self.eval_simple:
            # SSL validation: average train-step losses over val data
            meters: Dict[str, list] = {}
            it = iter(self.val_loader)
            try:
                for batch in it:
                    device_batch = shard_batch(batch, self.mesh)
                    _, log_vars = self._val_step(state, device_batch)
                    for k, v in jax.device_get(log_vars).items():
                        meters.setdefault(k, []).append(float(v))
            finally:
                if hasattr(it, 'close'):
                    it.close()
            metrics = {k: float(np.mean(v)) for k, v in meters.items()}
            self.log(dict(mode='val', epoch=self.epoch, **metrics))
        elif self.eval_fn is not None:
            results = self.eval_fn(state, self.val_loader)
            metrics = self.val_dataset.evaluate(
                results, metrics=self.eval_metrics)
            self.log(dict(mode='val', epoch=self.epoch, **metrics))
        if self.save_best and metrics and self.save_best in metrics:
            score = float(metrics[self.save_best])
            better = (self.best_score is None or
                      (score > self.best_score
                       if self.best_rule == 'greater'
                       else score < self.best_score))
            if better:
                self.best_score = score
                if self.best_ckpt_path and \
                        osp.exists(self.best_ckpt_path):
                    os.remove(self.best_ckpt_path)
                    if osp.exists(self.best_ckpt_path + '.meta.json'):
                        os.remove(self.best_ckpt_path + '.meta.json')
                self.best_ckpt_path = save_checkpoint(
                    _state_to_dict(state), self.work_dir, self.epoch,
                    prefix=f'best_{self.save_best}_'.replace('/', '_'))
                self.log(dict(mode='val', epoch=self.epoch,
                              best_score=score,
                              best_ckpt=self.best_ckpt_path))
        return state


def _state_to_dict(state: TrainState) -> Dict:
    from flax import serialization
    return serialization.to_state_dict(state)


class OmniSourceRunner(Runner):
    """Multi-source epoch runner (reference
    core/runner/omnisource_runner.py:30-162): loaders[0] is the main
    source and defines epoch length; each auxiliary source contributes
    ``train_ratio[1:]`` extra optimizer steps every ``train_ratio[0]``
    main iterations, with log vars suffixed /auxN."""

    def __init__(self, *args, aux_loaders=(), train_ratio=None, **kwargs):
        super().__init__(*args, **kwargs)
        self.aux_loaders = list(aux_loaders)
        self.train_ratio = list(train_ratio or
                                [1] + [1] * len(self.aux_loaders))
        self._iter = 0

    def _cycle(self, loader):
        while True:
            it = iter(loader)
            try:
                for b in it:
                    yield b
            finally:
                if hasattr(it, 'close'):
                    it.close()

    def train_epoch(self, state: TrainState) -> TrainState:
        self.train_loader.set_epoch(self.epoch)
        for ld in self.aux_loaders:
            ld.set_epoch(self.epoch)
        aux_iters = [self._cycle(ld) for ld in self.aux_loaders]
        use_aux_per_niter = self.train_ratio[0]
        aux_times = self.train_ratio[1:]
        n_batches = len(self.train_loader)
        t_end = time.time()
        it = iter(self.train_loader)
        try:
            for i, batch in enumerate(it):
                device_batch = shard_batch(batch, self.mesh)
                state, log_vars = self._train_step(state, device_batch)
                if (i + 1) % self.log_interval == 0 or \
                        i + 1 == n_batches:
                    self.log(dict(mode='train', epoch=self.epoch + 1,
                                  iter=i + 1, total_iters=n_batches,
                                  time=time.time() - t_end,
                                  **jax.device_get(log_vars)))
                if self._iter % use_aux_per_niter == 0:
                    for idx, times in enumerate(aux_times):
                        for _ in range(times):
                            aux_batch = shard_batch(next(aux_iters[idx]),
                                                    self.mesh)
                            state, aux_vars = self._train_step(
                                state, aux_batch)
                            if (i + 1) % self.log_interval == 0:
                                self.log(dict(
                                    mode='train', epoch=self.epoch + 1,
                                    iter=i + 1,
                                    **{f'{k}/aux{idx}': v for k, v in
                                       jax.device_get(aux_vars).items()}))
                self._iter += 1
                if self._preempt_signum is not None:
                    path = save_checkpoint(
                        _state_to_dict(state), self.work_dir, self.epoch,
                        meta=dict(preempted=True, iter=i + 1),
                        prefix='preempt_')
                    with open(osp.join(self.work_dir, 'latest'),
                              'w') as f:
                        f.write(osp.basename(path))
                    self.log(dict(mode='preempt', epoch=self.epoch + 1,
                                  iter=i + 1, checkpoint=path))
                    raise SystemExit(128 + int(self._preempt_signum))
                t_end = time.time()
        finally:
            if hasattr(it, 'close'):
                it.close()
        return state
