"""Inference/eval paths: score extraction, feature extraction, retrieval.

Parity: reference mmaction/apis/test.py (single/multi_gpu_test) and
tools/test_retrival.py:120-189,286-304. Under SPMD there is no result
gather — the jitted forward runs on the sharded global batch and results
land on host directly.
"""
from __future__ import annotations

import os
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

    max_k = min(max(topk), train_feats.shape[0])

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
        out[f'recall@{k}'] = float(
            hits[:, :min(k, max_k)].any(axis=1).mean())
    return out


def init_recognizer(config, checkpoint: Optional[str] = None):
    """Build a recognizer + variables from a config path/Config and an
    optional checkpoint (reference apis/inference.py:17-58).

    Returns (model, variables, cfg)."""
    from flax import serialization
    from .train import build_model_from_cfg
    from ..config import Config
    from ..core import load_checkpoint

    cfg = Config.fromfile(config) if isinstance(config, str) else config
    model_cfg = {k: v for k, v in dict(cfg.model).items()
                 if k != 'train_cfg'}
    model = build_model_from_cfg(model_cfg)

    pipeline_cfg = dict(cfg.data['test' if 'test' in cfg.data else
                                 'val'])['pipeline']
    sample = _pipeline_sample(pipeline_cfg, _dummy_results(cfg))
    imgs = np.asarray(sample['imgs'])[None]
    rng = jax.random.PRNGKey(0)
    variables = model.init({'params': rng, 'dropout': rng, 'moco': rng},
                           jnp.asarray(imgs), return_loss=False)
    if checkpoint:
        ckpt = load_checkpoint(checkpoint)
        if 'params' in ckpt:
            restored = {'params': ckpt['params']}
            if 'batch_stats' in ckpt:
                restored['batch_stats'] = ckpt['batch_stats']
            variables = serialization.from_state_dict(
                dict(variables), restored | {
                    k: v for k, v in dict(variables).items()
                    if k not in restored})
    return model, variables, cfg


def _dummy_results(cfg):
    """A synthetic pipeline input for shape discovery (covers frame-
    and skeleton-based pipelines)."""
    rng = np.random.default_rng(0)
    return dict(total_frames=64, start_index=0, modality='RGB',
                label=-1, _synthetic=True, img_shape=(64, 64),
                keypoint=rng.uniform(0, 64, (1, 64, 17, 2)).astype(
                    np.float32),
                keypoint_score=np.ones((1, 64, 17), np.float32))


def _pipeline_sample(pipeline_cfg, results):
    """Run the test pipeline on synthetic frames: decode steps are
    replaced by random frames for shape discovery."""
    from ..datasets.builder import PIPELINES
    from ..registry import build_from_cfg
    rng = np.random.default_rng(0)
    for tcfg in pipeline_cfg:
        t = build_from_cfg(dict(tcfg), PIPELINES)
        name = type(t).__name__
        if 'Decode' in name or 'Init' in name:
            results['imgs'] = [rng.integers(0, 256, (128, 128, 3))
                               .astype(np.uint8)
                               for _ in results.get(
                                   'frame_inds', np.zeros(8))]
            results['original_shape'] = (128, 128)
            results['img_shape'] = (128, 128)
            continue
        results = t(results)
    return results


def inference_recognizer(model, variables, cfg, video_path: str,
                         num_frames: Optional[int] = None):
    """Classify one video file / rawframe dir through the config's test
    pipeline (reference apis/inference.py:60-120). Returns (scores,
    top5 [(class, score)])."""
    import cv2
    from ..datasets.builder import PIPELINES
    from ..registry import build_from_cfg
    import os.path as osp

    results = dict(start_index=cfg.get('start_index', 0),
                   modality='RGB', label=-1)
    if osp.isdir(video_path):
        frames = sorted(os.listdir(video_path))
        results['frame_dir'] = video_path
        results['total_frames'] = len(frames)
        results['filename_tmpl'] = cfg.get('filename_tmpl',
                                           'img_{:05}.jpg')
    else:
        results['filename'] = video_path
        cap = cv2.VideoCapture(video_path)
        results['total_frames'] = int(cap.get(
            cv2.CAP_PROP_FRAME_COUNT))
        cap.release()
    if num_frames:
        results['total_frames'] = num_frames

    pipeline_cfg = dict(cfg.data['test' if 'test' in cfg.data else
                                 'val'])['pipeline']
    for tcfg in pipeline_cfg:
        t = build_from_cfg(dict(tcfg), PIPELINES)
        results = t(results)
    imgs = jnp.asarray(np.asarray(results['imgs'])[None])
    scores = np.asarray(model.apply(variables, imgs,
                                    return_loss=False))[0]
    top5 = sorted(enumerate(scores.tolist()), key=lambda kv: -kv[1])[:5]
    return scores, top5
