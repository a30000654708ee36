"""NumpyLoader — host-side global-batch assembly for SPMD training.

TPU-native replacement for torch DataLoader + DistributedSampler
(reference mmaction/datasets/builder.py:42-160, samplers/): JAX SPMD is a
single program, so one loader builds the *global* batch which the jitted
step shards over the device mesh. Worker parallelism uses threads (cv2 and
blosc-style codecs release the GIL during decode); prefetch overlaps host
decode with device compute.
"""
from __future__ import annotations

import multiprocessing
import os
import queue
import random
import sys
import threading
import time
from typing import Any, Dict, List, Optional

import numpy as np


def default_collate(samples: List[Dict[str, Any]]) -> Dict[str, Any]:
    """Stack a list of per-sample dicts into a batch dict.

    - np arrays            -> stacked along a new axis 0
    - [q, k] array lists   -> list of stacked arrays (MoCo paired views)
    - ints/floats          -> 1-D arrays
    - anything else        -> list (metadata)
    """
    assert len(samples) > 0
    out: Dict[str, Any] = {}
    for key in samples[0]:
        vals = [s[key] for s in samples]
        v0 = vals[0]
        if isinstance(v0, np.ndarray):
            if v0.shape == (1,) and v0.dtype in (np.int64, np.int32):
                out[key] = np.concatenate(vals)  # labels: (B,)
            else:
                out[key] = np.stack(vals)
        elif isinstance(v0, list) and len(v0) and isinstance(
                v0[0], np.ndarray):
            out[key] = [np.stack([v[i] for v in vals])
                        for i in range(len(v0))]
        elif isinstance(v0, (int, np.integer)):
            out[key] = np.asarray(vals, dtype=np.int64)
        elif isinstance(v0, (float, np.floating)):
            out[key] = np.asarray(vals, dtype=np.float32)
        else:
            out[key] = vals
    return out


def _pool_worker_main(dataset, task_q, result_q, seed, worker_id):
    """Decode-worker loop (forked process). Reseeds numpy/python RNGs per
    worker like the reference's worker_init_fn (datasets/builder.py
    worker seeding) so stochastic transforms decorrelate across workers.
    Workers run only numpy/cv2 pipeline code — never JAX. Tasks carry a
    generation id so results from an abandoned epoch can never be
    mistaken for the next epoch's batches."""
    # Decode workers must NEVER initialize the TPU backend: a second
    # process attaching to the chip can deadlock the trainer, and if the
    # TPU is unreachable the worker would hang at backend init. Force the
    # CPU platform both for not-yet-imported jax (forkserver/spawn: env
    # var is read at jax import, before the dataset unpickle can pull in
    # model modules) and for inherited-import jax (fork: config.update is
    # effective as long as this child never used a backend).
    os.environ['JAX_PLATFORMS'] = 'cpu'
    if 'jax' in sys.modules:
        try:
            sys.modules['jax'].config.update('jax_platforms', 'cpu')
        except Exception:
            pass
    try:  # one decode thread per worker — N workers already fill the
        import cv2  # cores; cv2's internal pool would oversubscribe
        cv2.setNumThreads(0)
    except Exception:
        pass
    np.random.seed((seed + worker_id) % (2 ** 32))
    random.seed(seed + worker_id)
    while True:
        task = task_q.get()
        if task is None:
            return
        gen, bid, inds = task
        try:
            result_q.put((gen, bid, [dataset[int(i)] for i in inds]))
        except BaseException as e:  # surface to the consumer
            result_q.put((gen, bid, RuntimeError(
                f'decode worker {worker_id} failed on batch {bid}: '
                f'{type(e).__name__}: {e}')))


def _route_result(result_q, gen: int, pending: Dict[int, Any],
                  timeout: float = 0.5) -> None:
    """Pop one result and route it by generation tag.

    - rgen == gen: this epoch's batch -> pending.
    - rgen <  gen: an abandoned epoch's leftover -> dropped.
    - rgen >  gen: a NEWER epoch's result popped by this (closing)
      epoch's lingering producer — re-queued so the rightful epoch's
      emit loop can claim it; dropping it would permanently lose the
      batch and hang the new epoch's in-order emit (ADVICE r2)."""
    try:
        rgen, bid, payload = result_q.get(timeout=timeout)
    except queue.Empty:
        return
    if rgen == gen:
        pending[bid] = payload
    elif rgen > gen:
        result_q.put((rgen, bid, payload))
        time.sleep(0.02)   # yield so the newer epoch's thread wins the re-get


class _ProcessPool:
    """Forked decode-worker pool — the torch-DataLoader-equivalent
    multi-process host input pipeline. cv2/np decode scales across cores
    without the GIL.

    Start method: 'fork' by default — it inherits the dataset without
    pickling it, but forking an already multi-threaded parent (the JAX
    runtime + prefetch threads) can in principle deadlock workers on
    inherited locks, so workers run pure numpy/cv2 code and the pool
    should be created before heavy JAX activity where possible;
    'forkserver'/'spawn' are selectable via ``mp_context`` when the
    dataset is picklable (ADVICE r2)."""

    def __init__(self, dataset, num_workers: int, seed: int,
                 mp_context: str = 'fork'):
        ctx = multiprocessing.get_context(mp_context)
        self.task_q = ctx.Queue()
        self.result_q = ctx.Queue()
        self.generation = 0
        self.workers = []
        for wid in range(num_workers):
            p = ctx.Process(target=_pool_worker_main,
                            args=(dataset, self.task_q, self.result_q,
                                  seed, wid),
                            daemon=True)
            p.start()
            self.workers.append(p)

    def shutdown(self):
        for _ in self.workers:
            try:
                self.task_q.put(None)
            except Exception:
                pass
        for p in self.workers:
            p.join(timeout=2.0)
            if p.is_alive():
                p.terminate()
        self.workers = []


class _EpochIterator:

    def __init__(self, loader: 'NumpyLoader', order: np.ndarray):
        self.loader = loader
        self.order = order
        self.batch_size = loader.batch_size
        n = len(order)
        if loader.drop_last:
            self.num_batches = n // self.batch_size
        else:
            self.num_batches = (n + self.batch_size - 1) // self.batch_size
        self._q: 'queue.Queue' = queue.Queue(maxsize=loader.prefetch)
        self._stop = threading.Event()
        target = (self._producer_pool
                  if loader.workers_mode == 'process' and
                  loader.num_workers > 0 else self._producer)
        self._thread = threading.Thread(target=target, daemon=True)
        self._thread.start()
        self._served = 0

    def _load_one(self, idx):
        return self.loader.dataset[int(idx)]

    def _producer_pool(self):
        """Dispatch batches to the process pool; emit results in order.
        Each epoch bumps the pool generation; results tagged with an
        older generation (an abandoned epoch's leftovers) are
        discarded."""
        pool = self.loader._get_pool()
        pool.generation += 1
        gen = pool.generation
        max_out = len(pool.workers) + self.loader.prefetch
        pending: Dict[int, Any] = {}
        next_submit = next_emit = 0
        try:
            while next_emit < self.num_batches:
                while (next_submit < self.num_batches and
                       next_submit - next_emit < max_out):
                    inds = self.order[next_submit * self.batch_size:
                                      (next_submit + 1) * self.batch_size]
                    pool.task_q.put((gen, next_submit,
                                     list(map(int, inds))))
                    next_submit += 1
                while next_emit not in pending:
                    if self._stop.is_set():
                        return
                    _route_result(pool.result_q, gen, pending)
                payload = pending.pop(next_emit)
                if isinstance(payload, BaseException):
                    raise payload
                batch = self.loader.collate_fn(payload)
                next_emit += 1
                while not self._stop.is_set():
                    try:
                        self._q.put(batch, timeout=0.5)
                        break
                    except queue.Full:
                        continue
        except BaseException as e:
            self._q.put(e)

    def _producer(self):
        try:
            for b in range(self.num_batches):
                if self._stop.is_set():
                    return
                inds = self.order[b * self.batch_size:
                                  (b + 1) * self.batch_size]
                if self.loader.num_workers > 1:
                    samples = [None] * len(inds)

                    def work(slot, i):
                        samples[slot] = self._load_one(i)

                    threads = []
                    for slot, i in enumerate(inds):
                        t = threading.Thread(target=work, args=(slot, i))
                        t.start()
                        threads.append(t)
                    for t in threads:
                        t.join()
                else:
                    samples = [self._load_one(i) for i in inds]
                batch = self.loader.collate_fn(samples)
                # timeout-put loop so a producer blocked on a full queue
                # still observes close() (no daemon-thread leak)
                while not self._stop.is_set():
                    try:
                        self._q.put(batch, timeout=0.5)
                        break
                    except queue.Full:
                        continue
        except BaseException as e:  # surface worker errors to the consumer
            self._q.put(e)

    def __iter__(self):
        return self

    def __len__(self):
        return self.num_batches

    def __next__(self):
        if self._served >= self.num_batches:
            raise StopIteration
        item = self._q.get()
        if isinstance(item, BaseException):
            raise item
        self._served += 1
        return item

    def close(self):
        self._stop.set()


class NumpyLoader:
    """Iterable over global batches; reshuffles per epoch with a
    deterministic seed (DistributedSampler set_epoch semantics,
    reference samplers/distributed_sampler.py:12-48)."""

    def __init__(self, dataset, batch_size, shuffle=True, seed=None,
                 drop_last=False, num_workers=0, prefetch=2,
                 collate_fn=default_collate, sampler=None,
                 workers_mode='thread', mp_context='fork'):
        assert workers_mode in ('thread', 'process'), workers_mode
        self.mp_context = mp_context
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = 0 if seed is None else seed
        self.drop_last = drop_last
        self.num_workers = num_workers
        self.prefetch = max(1, prefetch)
        self.collate_fn = collate_fn
        self.sampler = dict(sampler) if sampler else None
        self.workers_mode = workers_mode
        self._pool: Optional[_ProcessPool] = None
        self.epoch = 0

    def _get_pool(self) -> _ProcessPool:
        if self._pool is None or not self._pool.workers:
            self._pool = _ProcessPool(self.dataset, self.num_workers,
                                      self.seed, self.mp_context)
        return self._pool

    def shutdown(self):
        if self._pool is not None:
            self._pool.shutdown()
            self._pool = None

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _class_balanced_order(self, rng):
        """ClassSpecificDistributedSampler semantics (reference
        samplers/distributed_sampler.py:50-140): sample classes with
        probability proportional to freq**power (power=0 -> uniform over
        classes), then an instance uniformly within the class."""
        by_class = getattr(self.dataset, 'video_infos_by_class', None)
        power = getattr(self.dataset, 'power', 0.0)
        labels = sorted(by_class)
        freqs = np.array([len(by_class[c]) for c in labels], np.float64)
        probs = freqs ** power
        probs = probs / probs.sum()
        class_indices = {c: [] for c in labels}
        for i, info in enumerate(self.dataset.video_infos):
            class_indices[info['label']].append(i)
        n = len(self.dataset)
        chosen_classes = rng.choice(len(labels), size=n, p=probs)
        order = np.array([
            class_indices[labels[c]][rng.integers(
                len(class_indices[labels[c]]))]
            for c in chosen_classes])
        return order

    def _pk_order(self, rng, pk_sample_num):
        """PKDistributedSampler semantics (reference
        samplers/distributed_sampler.py:141-201, reid): each shuffled
        anchor is followed by pk_sample_num-1 other samples of its
        class."""
        labels = [info['label']
                  for info in self.dataset.video_infos]
        class_indices: Dict[Any, list] = {}
        for i, lab in enumerate(labels):
            class_indices.setdefault(lab, []).append(i)
        base = rng.permutation(len(labels)) if self.shuffle else \
            np.arange(len(labels))
        order = []
        for ind in base:
            order.append(ind)
            pool = [i for i in class_indices[labels[ind]] if i != ind]
            k = pk_sample_num - 1
            if pool:
                extra = rng.choice(pool, size=k, replace=len(pool) < k)
                order.extend(int(x) for x in extra)
            else:
                order.extend([int(ind)] * k)
        return np.asarray(order)

    def __iter__(self):
        n = len(self.dataset)
        rng = np.random.default_rng(self.seed + self.epoch)
        if self.sampler and self.sampler.get('type') in (
                'PKDistributedSampler', 'PKSampler'):
            order = self._pk_order(
                rng, self.sampler.get('pk_sample_num', 2))
        elif getattr(self.dataset, 'sample_by_class', False) and \
                self.shuffle:
            order = self._class_balanced_order(rng)
        elif self.shuffle:
            order = rng.permutation(n)
        else:
            order = np.arange(n)
        return _EpochIterator(self, order)
