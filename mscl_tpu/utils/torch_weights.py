"""Torch-checkpoint converters for the video ResNet family.

Maps official torchvision VideoResNet state dicts (r3d_18/mc3_18 — e.g.
r3d_18-b3b3357e.pth) onto this repo's flax param/batch_stats trees, so
reference-published pretrained weights drop in for supervised baselines
and parity validation. Torch is only needed for unpickling.

torch name -> flax path:
  stem.0/1                     -> stem/{conv,bn}
  layerL.B.conv1.0/1           -> layer{L}_{B}/conv1/{conv,bn}
  layerL.B.conv2.0/1           -> layer{L}_{B}/conv2/{conv,bn}
  layerL.B.downsample.0/1      -> layer{L}_{B}/downsample/{conv,bn}
  fc                           -> dropped (reference disables it,
                                  base_moco.py:92-94)
"""
from __future__ import annotations

import re
from typing import Dict

import numpy as np


def _conv_w(v) -> np.ndarray:
    """torch Conv3d OIdhw -> flax (kt, kh, kw, I, O)."""
    return np.transpose(v, (2, 3, 4, 1, 0))


def convert_videoresnet_state_dict(sd: Dict[str, 'np.ndarray']):
    """state dict (numpy values) -> (params, batch_stats) nested dicts."""
    params: Dict = {}
    stats: Dict = {}

    def put(tree, path, value):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = np.ascontiguousarray(value)

    def norm_leaf(prefix, leaf, v):
        if leaf == 'weight':
            put(params, prefix + ('bn', 'scale'), v)
        elif leaf == 'bias':
            put(params, prefix + ('bn', 'bias'), v)
        elif leaf == 'running_mean':
            put(stats, prefix + ('bn', 'mean'), v)
        elif leaf == 'running_var':
            put(stats, prefix + ('bn', 'var'), v)

    block_re = re.compile(
        r'^layer(\d)\.(\d)\.(conv1|conv2|downsample)\.(\d)\.(.+)$')
    for key, v in sd.items():
        if key.startswith('fc.'):
            continue
        m = block_re.match(key)
        if m:
            layer, block, sub, idx, leaf = m.groups()
            prefix = (f'layer{layer}_{block}', sub)
            if idx == '0':  # conv
                if leaf == 'weight':
                    put(params, prefix + ('conv', 'kernel'), _conv_w(v))
            else:           # bn
                norm_leaf(prefix, leaf, v)
            continue
        m = re.match(r'^stem\.(\d)\.(.+)$', key)
        if m:
            idx, leaf = m.groups()
            if idx == '0' and leaf == 'weight':
                put(params, ('stem', 'conv', 'kernel'), _conv_w(v))
            elif idx == '1':
                norm_leaf(('stem',), leaf, v)
    return params, stats


def load_torchvision_video_resnet(pth_path: str):
    """Load an official torchvision VideoResNet .pth -> (params,
    batch_stats) for our 'torchvision.r3d_18'/'torchvision.mc3_18'
    backbones."""
    import torch
    sd = torch.load(pth_path, map_location='cpu')
    if 'state_dict' in sd:
        sd = sd['state_dict']
    sd = {k: v.numpy() for k, v in sd.items()
          if hasattr(v, 'numpy')}
    return convert_videoresnet_state_dict(sd)


def graft_backbone_weights(variables: Dict, params: Dict, stats: Dict,
                           module_name: str = 'backbone_m') -> Dict:
    """Insert converted weights into a model's variables under
    module_name (strict on matching paths, tolerant of extras)."""
    from ..models.recognizers.base import graft_subtree, get_by_path, \
        set_by_path
    out = dict(variables)
    for coll, src in (('params', params), ('batch_stats', stats)):
        tgt = get_by_path(variables[coll], module_name)
        new_tgt, missing = graft_subtree(tgt, src)
        if missing:
            print(f'[torch_weights] {coll}: {len(missing)} leaves not '
                  f'covered (first: {missing[:3]})')
        out[coll] = set_by_path(variables[coll], module_name, new_tgt)
    return out


def convert_recognizer_checkpoint(path: str):
    """Convert a reference fine-tuned torch checkpoint (Recognizer with
    a torchvision-VideoResNet ``backbone.*`` and a pool-fc
    ``cls_head.fc_cls.*``) into this framework's checkpoint collections
    ({'params': ..., 'batch_stats': ...}), consumable by
    restore_model_state / tools/test.py / tools/test_retrieval.py."""
    import torch
    sd = torch.load(path, map_location='cpu', weights_only=False)
    sd = sd.get('state_dict', sd)
    sd = {k: v.detach().numpy() if hasattr(v, 'detach') else v
          for k, v in sd.items()}
    bb = {k[len('backbone.'):]: v for k, v in sd.items()
          if k.startswith('backbone.')}
    if not any(k.startswith('stem.') for k in bb):
        raise NotImplementedError(
            'convert_recognizer_checkpoint supports torchvision-'
            'VideoResNet backbones; found keys like '
            f'{list(bb)[:3] or list(sd)[:3]}')
    params, stats = convert_videoresnet_state_dict(bb)
    out_params = {'backbone_m': params}
    out_stats = {'backbone_m': stats}
    head = {}
    if 'cls_head.fc_cls.weight' in sd:
        head['fc_cls'] = {
            'kernel': np.ascontiguousarray(
                sd['cls_head.fc_cls.weight'].T),
            'bias': np.ascontiguousarray(sd['cls_head.fc_cls.bias']),
        }
    if head:
        out_params['cls_head_m'] = head
    return {'params': out_params, 'batch_stats': out_stats}
