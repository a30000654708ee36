"""train_model — config -> runner wiring.

Parity: reference mmaction/apis/train.py:18-238 (dataloaders -> DDP ->
optimizer -> EpochBasedRunner -> hooks -> resume -> run), re-expressed as:
loaders -> DP mesh -> optax chain -> jitted step -> Runner. The per-GPU
batch size becomes per-device; the global batch is
videos_per_gpu * len(mesh devices), keeping the reference's
lr-per-batch-size semantics.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np

from ..core import (Runner, build_lr_schedule, build_optimizer, init_state,
                    load_checkpoint)
from ..core.train_loop import TrainState
from ..datasets import build_dataloader, build_dataset
from ..datasets.loader import default_collate
from ..models import RECOGNIZERS
from ..models.recognizers import (build_ema_fn, init_from_ssl_pretrain,
                                  sync_key_variables)
from ..parallel.mesh import create_mesh, shard_batch

# q->k towers are updated by EMA, not SGD (reference requires_grad=False,
# moco.py:379-387)
MOCO_FREEZE = ('encoder_k', 'neck_k', 'mlp_k')

# config-name -> flax-attribute-name for checkpoint-surgery paths
_NAME_MAP = {'backbone': 'backbone_m', 'recognizer': 'recognizer_m',
             'recognizer_flow': 'recognizer_flow_m',
             'cls_head': 'cls_head_m'}


def normalize_module_path(path: str) -> str:
    parts = path.replace('.', '/').split('/')
    return '/'.join(_NAME_MAP.get(p, p) for p in parts)


def build_model_from_cfg(model_cfg: Dict, dtype=None):
    cfg = dict(model_cfg)
    model_type = cfg.pop('type')
    cls = RECOGNIZERS.get(model_type)
    if cls is None:
        raise KeyError(f'unknown recognizer {model_type}')
    if dtype is not None:
        cfg['dtype'] = dtype
    return cls(**cfg)


def _is_moco(model_cfg: Dict) -> bool:
    t = model_cfg.get('type', '')
    return t in ('MoCo', 'MoCoV2', 'MSCL', 'MSCLWithAug', 'MoDist')


def example_batch_from(dataset, batch_size: int) -> Dict:
    n = min(batch_size, len(dataset))
    samples = [dataset[i % len(dataset)] for i in range(n)]
    batch = default_collate(samples)
    if n < batch_size:  # pad by repetition to the full global batch
        def pad(x):
            if isinstance(x, list):
                return [pad(v) for v in x]
            if hasattr(x, 'shape'):
                reps = [int(np.ceil(batch_size / x.shape[0]))] + \
                    [1] * (x.ndim - 1)
                return np.tile(x, reps)[:batch_size]
            return x
        batch = {k: pad(v) for k, v in batch.items()}
    return batch


def _torch_ssl_checkpoint_vars(ckpt_path: str, raw_prefix: str,
                               prefix: str) -> Dict:
    """Load a reference torch .pth MSCL checkpoint and convert the
    ``<raw_prefix>.*`` encoder (torchvision VideoResNet names, the
    r3d_18 flagship) into flax params/batch_stats nested under the
    normalized flax ``prefix`` so the normal surgery path applies
    unchanged. raw_prefix matches the torch key names
    ('recognizer.encoder_q'); prefix is the flax module path
    ('recognizer_m/encoder_q')."""
    import torch

    from ..utils.torch_weights import convert_videoresnet_state_dict
    sd = torch.load(ckpt_path, map_location='cpu',
                    weights_only=False)
    sd = sd.get('state_dict', sd)
    dot_prefix = raw_prefix.replace('/', '.') + '.'
    sub = {k[len(dot_prefix):]: v.detach().numpy()
           for k, v in sd.items() if k.startswith(dot_prefix)}
    if not sub:
        raise KeyError(
            f'no keys under prefix {dot_prefix!r} in torch checkpoint '
            f'{ckpt_path} (found e.g. {list(sd)[:3]})')
    if not any(k.startswith('stem.') for k in sub):
        raise NotImplementedError(
            'torch-checkpoint surgery currently converts torchvision '
            'VideoResNet encoders (the r3d_18 flagship); found a '
            f'different architecture under {dot_prefix!r}')
    params, stats = convert_videoresnet_state_dict(sub)

    def nest(tree):
        for part in reversed(prefix.split('/')):
            tree = {part: tree}
        return tree

    return {'params': nest(params), 'batch_stats': nest(stats)}


def apply_ssl_pretrain(variables: Dict, ssl_cfg: Dict) -> Dict:
    """reference base.py:129-203 (init_from_ssl_pretrain). Accepts both
    this framework's msgpack checkpoints and the reference's torch
    ``.pth`` files (e.g. the published MSCL ``epoch_400.pth``)."""
    ckpt_path = ssl_cfg['pretrained']['filename']
    bb_cfg = ssl_cfg.get('backbone', {})
    prefix = normalize_module_path(bb_cfg.get('prefix',
                                              'recognizer.encoder_q'))
    if ckpt_path.endswith(('.pth', '.pt', '.tar')):
        raw_prefix = bb_cfg.get('prefix', 'recognizer.encoder_q')
        ckpt_vars = _torch_ssl_checkpoint_vars(ckpt_path, raw_prefix,
                                               prefix)
        return init_from_ssl_pretrain(
            variables, ckpt_vars, module_name='backbone_m',
            prefix=prefix,
            extras=tuple(ssl_cfg.get('extras', ('fc',))),
            revise_keys=ssl_cfg.get('revise_keys', ()),
            duplicate_keys=ssl_cfg.get('duplicate_keys', ()))
    ckpt = load_checkpoint(ckpt_path)
    ckpt_vars = {'params': ckpt.get('params', ckpt),
                 'batch_stats': ckpt.get('batch_stats', {})}
    return init_from_ssl_pretrain(
        variables, ckpt_vars, module_name='backbone_m',
        prefix=prefix, extras=tuple(ssl_cfg.get('extras', ('fc',))),
        revise_keys=ssl_cfg.get('revise_keys', ()),
        duplicate_keys=ssl_cfg.get('duplicate_keys', ()))


def train_model(cfg, validate: bool = True, resume_from: Optional[str] = None,
                seed: Optional[int] = None, max_epochs: Optional[int] = None,
                mesh=None):
    """Build everything from a Config and run training.

    Returns (runner, final TrainState).
    """
    mesh = mesh or create_mesh()
    num_devices = len(mesh.devices.flatten())

    train_dataset = build_dataset(cfg.data['train'].to_dict()
                                  if hasattr(cfg.data['train'], 'to_dict')
                                  else dict(cfg.data['train']))
    train_loader = build_dataloader(
        train_dataset,
        videos_per_gpu=cfg.data['videos_per_gpu'],
        workers_per_gpu=cfg.data.get('workers_per_gpu', 0),
        num_gpus=num_devices,
        shuffle=True, seed=seed,
        drop_last=cfg.data.get('train_dataloader', {}).get(
            'drop_last', True),
        workers_mode=cfg.data.get('workers_mode', 'thread'),
        sampler=cfg.data.get('sampler'))

    val_loader = val_dataset = None
    if validate and 'val' in cfg.data:
        val_dataset = build_dataset(dict(cfg.data['val']))
        val_loader = build_dataloader(
            val_dataset,
            videos_per_gpu=cfg.data['videos_per_gpu'],
            workers_per_gpu=cfg.data.get('workers_per_gpu', 0),
            num_gpus=num_devices, shuffle=False,
            drop_last=cfg.data.get('val_dataloader', {}).get(
                'drop_last', False))

    model_cfg = dict(cfg.model)
    model = build_model_from_cfg(model_cfg)
    is_moco = _is_moco(model_cfg)

    total_epochs = max_epochs or cfg.get('total_epochs', 1)
    steps_per_epoch = max(len(train_loader), 1)
    lr_schedule = build_lr_schedule(
        dict(cfg.get('lr_config') or {}), cfg.optimizer['lr'],
        total_epochs, steps_per_epoch)
    tx = build_optimizer(
        dict(cfg.optimizer), lr_schedule,
        grad_clip=(cfg.get('optimizer_config') or {}).get('grad_clip'),
        freeze_patterns=MOCO_FREEZE if is_moco else ())

    example = example_batch_from(
        train_dataset, cfg.data['videos_per_gpu'] * num_devices)
    rng = jax.random.PRNGKey(seed or 0)

    def post_init(variables):
        if is_moco:
            variables = sync_key_variables(variables)
        ssl_cfg = (model_cfg.get('train_cfg') or {}).get('ssl_pretrain')
        if ssl_cfg:
            variables = apply_ssl_pretrain(dict(variables), dict(ssl_cfg))
        return variables

    state = init_state(model, tx, example, rng=rng,
                       post_init_fn=post_init)

    eval_fn = None
    if val_loader is not None and not (cfg.get('evaluation') or {}).get(
            'simple', False):
        from .inference import make_eval_fn
        eval_fn = make_eval_fn(model, mesh)

    runner = Runner(
        model, tx, train_loader, cfg, cfg.get('work_dir', './work_dir'),
        val_loader=val_loader, val_dataset=val_dataset,
        pre_update_fn=build_ema_fn(model) if is_moco else None,
        mesh=mesh, lr_schedule=lr_schedule, eval_fn=eval_fn)
    if max_epochs is not None:
        runner.total_epochs = max_epochs

    if resume_from or cfg.get('resume_from'):
        state = runner.resume(state, resume_from or cfg.get('resume_from'))
    state = runner.run(state)
    return runner, state
