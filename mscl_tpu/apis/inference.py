"""Inference/eval paths: score extraction, feature extraction, retrieval.

Parity: reference mmaction/apis/test.py (single/multi_gpu_test) and
tools/test_retrival.py:120-189,286-304. Under SPMD there is no result
gather — the jitted forward runs on the sharded global batch and results
land on host directly.
"""
from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..parallel.mesh import create_mesh, shard_batch


def _pad_batch(imgs, batch_size):
    """Pad the last partial batch to the full global batch size (static
    shapes keep one compiled program)."""
    n = imgs.shape[0]
    if n == batch_size:
        return imgs, n
    reps = int(np.ceil(batch_size / n))
    return np.tile(imgs, (reps,) + (1,) * (imgs.ndim - 1))[:batch_size], n


def make_eval_fn(model, mesh=None):
    """Returns eval_fn(state, loader) -> list of per-video score arrays
    (reference single_gpu_test semantics)."""
    mesh = mesh or create_mesh()

    @jax.jit
    def forward(params, batch_stats, imgs):
        return model.apply({'params': params, 'batch_stats': batch_stats},
                           imgs, train=False, return_loss=False)

    def eval_fn(state, loader) -> List[np.ndarray]:
        results: List[np.ndarray] = []
        batch_size = None
        for batch in loader:
            imgs = batch['imgs']
            if batch_size is None:
                batch_size = imgs.shape[0]
            imgs, n = _pad_batch(np.asarray(imgs), batch_size)
            device_batch = shard_batch({'imgs': imgs}, mesh)
            scores = jax.device_get(forward(state.params,
                                            state.batch_stats,
                                            device_batch['imgs']))
            results.extend(list(scores[:n]))
        return results

    return eval_fn


def make_feature_fn(model, mesh=None):
    """Pooled feature extraction for retrieval (reference
    recognizer3d.py:67-93 path)."""
    mesh = mesh or create_mesh()

    @jax.jit
    def forward(params, batch_stats, imgs):
        return model.apply({'params': params, 'batch_stats': batch_stats},
                           imgs, method='extract_features_pooled')

    def feature_fn(state, loader) -> np.ndarray:
        feats: List[np.ndarray] = []
        batch_size = None
        for batch in loader:
            imgs = batch['imgs']
            if batch_size is None:
                batch_size = imgs.shape[0]
            imgs, n = _pad_batch(np.asarray(imgs), batch_size)
            device_batch = shard_batch({'imgs': imgs}, mesh)
            out = jax.device_get(forward(state.params, state.batch_stats,
                                         device_batch['imgs']))
            feats.extend(list(out[:n]))
        return np.stack(feats)

    return feature_fn


def run_test(model, state, loader, mesh=None) -> List[np.ndarray]:
    return make_eval_fn(model, mesh)(state, loader)


def extract_features(model, state, loader, mesh=None) -> np.ndarray:
    return make_feature_fn(model, mesh)(state, loader)


def retrieval_recall(train_feats: np.ndarray, train_labels,
                     test_feats: np.ndarray, test_labels,
                     topk=(1, 5, 10, 20, 50)) -> Dict[str, float]:
    """kNN retrieval protocol (reference test_retrival.py:286-304):
    center both sets by the joint mean, L2-normalize, sim = test @ train^T,
    Recall@k = any top-k neighbor shares the label. The similarity matmul
    is jitted (MXU)."""
    train_labels = np.asarray(train_labels)
    test_labels = np.asarray(test_labels)
    mean = np.concatenate([train_feats, test_feats]).mean(
        axis=0, keepdims=True)
    tr = train_feats - mean
    te = test_feats - mean
    tr = tr / np.clip(np.linalg.norm(tr, axis=1, keepdims=True), 1e-12,
                      None)
    te = te / np.clip(np.linalg.norm(te, axis=1, keepdims=True), 1e-12,
                      None)

    max_k = max(topk)

    @jax.jit
    def topk_idx(a, b):
        sim = jnp.dot(a, b.T, preferred_element_type=jnp.float32)
        _, idx = jax.lax.top_k(sim, max_k)
        return idx

    idx = np.asarray(topk_idx(jnp.asarray(te), jnp.asarray(tr)))
    neighbor_labels = train_labels[idx]            # (n_test, max_k)
    hits = neighbor_labels == test_labels[:, None]
    out = {}
    for k in topk:
        out[f'recall@{k}'] = float(hits[:, :k].any(axis=1).mean())
    return out
