"""Recognizer base utilities: loss parsing and SSL checkpoint surgery.

Parity: reference mmaction/models/recognizers/base.py —
  - _parse_losses (:274-308): mean each loss tensor, sum keys containing
    'loss' into the total. The reference all_reduces log vars across ranks;
    under jit-over-a-mesh the metrics are computed on the global batch
    already, so no explicit collective is needed.
  - SSL checkpoint surgery (:129-203): get_ssl_state_dict strips/renames
    keys; init_from_ssl_pretrain loads 'recognizer.encoder_q.*' into
    'backbone', skipping extras like the fc head. Here the surgery operates
    on nested param pytrees (orbax checkpoints) instead of flat state
    dicts.
"""
from __future__ import annotations

import re
from typing import Any, Dict, List, Optional, Tuple

import jax.numpy as jnp


def parse_losses(losses: Dict[str, Any]) -> Tuple[jnp.ndarray, Dict]:
    """Sum '*loss*' keys into total loss; mean everything for logging."""
    log_vars = {}
    for name, value in losses.items():
        log_vars[name] = jnp.asarray(value).mean()
    loss = sum(v for k, v in log_vars.items() if 'loss' in k)
    log_vars['loss'] = loss
    return loss, log_vars


def get_by_path(tree: Dict, path: str) -> Optional[Dict]:
    """Fetch a nested subtree by '/'-joined path; None if missing."""
    node = tree
    for part in path.split('/'):
        if not part:
            continue
        if not isinstance(node, dict) or part not in node:
            return None
        node = node[part]
    return node


def set_by_path(tree: Dict, path: str, value) -> Dict:
    """Return a copy of tree with the subtree at path replaced."""
    parts = [p for p in path.split('/') if p]
    if not parts:
        return value
    out = dict(tree)
    out[parts[0]] = set_by_path(tree.get(parts[0], {}),
                                '/'.join(parts[1:]), value)
    return out


def get_ssl_state_dict(ckpt_params: Dict, revise_keys=(), duplicate_keys=(),
                       prefix: str = '') -> Dict:
    """Extract + rename a param subtree from an SSL checkpoint
    (reference base.py:167-188 regex rewrite semantics, applied to
    '/'-joined pytree paths)."""
    import jax

    flat = jax.tree_util.tree_flatten_with_path(ckpt_params)[0]

    def path_str(kp):
        return '/'.join(getattr(k, 'key', str(k)) for k in kp)

    items = {path_str(kp): v for kp, v in flat}
    for pattern, replacement in revise_keys:
        items = {re.sub(pattern, replacement, k): v
                 for k, v in items.items()}
    for pattern, replacement in duplicate_keys:
        extra = {re.sub(pattern, replacement, k): v
                 for k, v in items.items() if re.search(pattern, k)}
        items.update(extra)
    if prefix:
        pref = prefix.replace('.', '/') + '/'
        items = {k[len(pref):]: v for k, v in items.items()
                 if k.startswith(pref)}
    # rebuild nested tree
    tree: Dict = {}
    for k, v in items.items():
        parts = k.split('/')
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def graft_subtree(target: Dict, source: Dict, extras: List[str] = ()
                  ) -> Tuple[Dict, List[str]]:
    """Copy leaves of source into target where paths match (strict=False
    load, reference base.py:190-203); paths containing any of ``extras``
    (e.g. 'fc') are skipped. Returns (new_target, missing_paths)."""
    missing = []

    def rec(t, s, path):
        if not isinstance(t, dict):
            return s if not isinstance(s, dict) else t
        out = dict(t)
        for k, v in t.items():
            p = f'{path}/{k}' if path else k
            if any(e in p for e in extras):
                continue
            if isinstance(s, dict) and k in s:
                if isinstance(v, dict):
                    out[k] = rec(v, s[k], p)
                else:
                    src = s[k]
                    if hasattr(src, 'shape') and hasattr(v, 'shape') and \
                            src.shape != v.shape:
                        missing.append(f'{p} (shape mismatch)')
                    else:
                        out[k] = jnp.asarray(src).astype(v.dtype) \
                            if hasattr(v, 'dtype') else src
            else:
                missing.append(p)
        return out

    return rec(target, source, ''), missing


def init_from_ssl_pretrain(variables: Dict, ckpt_variables: Dict,
                           module_name: str = 'backbone',
                           prefix: str = 'recognizer.encoder_q',
                           extras: List[str] = ('fc',),
                           revise_keys=(), duplicate_keys=()) -> Dict:
    """Load SSL-pretrained encoder weights into a fine-tune model's
    backbone (reference base.py:129-203). Grafts both 'params' and
    'batch_stats' collections."""
    out = dict(variables)
    for coll in ('params', 'batch_stats'):
        if coll not in variables or coll not in ckpt_variables:
            continue
        src = get_ssl_state_dict(ckpt_variables[coll], revise_keys,
                                 duplicate_keys, prefix)
        tgt = get_by_path(variables[coll], module_name)
        if tgt is None:
            raise KeyError(f'{module_name} not in model {coll}')
        new_tgt, missing = graft_subtree(tgt, src, list(extras))
        if missing:
            print(f'[ssl_pretrain] {coll}: {len(missing)} params not '
                  f'loaded (first few: {missing[:5]})')
        out[coll] = set_by_path(variables[coll], module_name, new_tgt)
    return out
