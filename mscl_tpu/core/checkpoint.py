"""Checkpoint save/load/resume.

Parity: mmcv CheckpointHook writes epoch_N.pth with model + optimizer +
meta (reference tools/train.py:180-185, apis/train.py:162-168 resume).
Here checkpoints are msgpack-serialized pytrees (flax.serialization) under
work_dir/epoch_N.ckpt plus a 'latest' pointer; everything in TrainState —
including the MoCo queue AND the momentum iteration counter — persists, so
resume is exact (the reference's `self.iters` silently reset on resume,
SURVEY §5; fixed here by making it state).
"""
from __future__ import annotations

import json
import os
import os.path as osp
from typing import Any, Dict, Optional

import jax
import numpy as np
from flax import serialization


def save_checkpoint(state_dict: Dict[str, Any], work_dir: str,
                    epoch: int, meta: Optional[Dict] = None,
                    prefix: str = '') -> str:
    """prefix != '' writes an auxiliary checkpoint (e.g. the eval hook's
    best_<metric>_ one) that does NOT move the 'latest' resume pointer."""
    os.makedirs(work_dir, exist_ok=True)
    name = f'{prefix}epoch_{epoch}.ckpt'
    path = osp.join(work_dir, name)
    host_state = jax.device_get(state_dict)
    with open(path, 'wb') as f:
        f.write(serialization.msgpack_serialize(
            _to_serializable(host_state)))
    meta = dict(meta or {}, epoch=epoch)
    with open(path + '.meta.json', 'w') as f:
        json.dump(meta, f)
    if not prefix:
        with open(osp.join(work_dir, 'latest'), 'w') as f:
            f.write(name)
    return path


def load_checkpoint(path: str) -> Dict[str, Any]:
    if osp.isdir(path):
        with open(osp.join(path, 'latest')) as f:
            path = osp.join(path, f.read().strip())
    if path.endswith(('.pth', '.pt', '.tar')):
        # reference torch checkpoint (fine-tuned Recognizer with a
        # torchvision-VideoResNet backbone): convert to our collections
        from ..utils.torch_weights import convert_recognizer_checkpoint
        return convert_recognizer_checkpoint(path)
    with open(path, 'rb') as f:
        return serialization.msgpack_restore(f.read())


def load_meta(path: str) -> Dict[str, Any]:
    meta_path = path + '.meta.json'
    if osp.exists(meta_path):
        with open(meta_path) as f:
            return json.load(f)
    return {}


def latest_checkpoint(work_dir: str) -> Optional[str]:
    latest = osp.join(work_dir, 'latest')
    if not osp.exists(latest):
        return None
    with open(latest) as f:
        return osp.join(work_dir, f.read().strip())


def _to_serializable(tree):
    def conv(x):
        if isinstance(x, (np.ndarray, np.generic)):
            return x
        if hasattr(x, 'dtype') and hasattr(x, 'shape'):
            return np.asarray(x)
        return x
    return jax.tree.map(conv, tree)


def publish_model(in_path: str, out_path: str) -> str:
    """Strip optimizer state and append a content hash
    (parity: tools/deployment/publish_model.py)."""
    import hashlib
    state = load_checkpoint(in_path)
    state.pop('opt_state', None)
    blob = serialization.msgpack_serialize(_to_serializable(state))
    sha = hashlib.sha256(blob).hexdigest()[:8]
    final = out_path.replace('.ckpt', f'-{sha}.ckpt')
    with open(final, 'wb') as f:
        f.write(blob)
    return final


def restore_model_state(state, ckpt: Dict[str, Any]):
    """Restore only the model collections (params / batch_stats /
    moco_state) from a training checkpoint into an eval-side TrainState.

    Eval entry points build a dummy optimizer, so the checkpoint's
    opt_state tree (clip + wd + momentum + lr transforms) does not match
    and a full from_state_dict fails; inference only needs the model
    collections anyway."""
    from flax import serialization
    out = state
    for coll in ('params', 'batch_stats', 'moco_state'):
        if coll in ckpt and getattr(state, coll) is not None:
            restored = serialization.from_state_dict(
                getattr(state, coll), ckpt[coll], name=coll)
            out = out.replace(**{coll: restored})
    return out
