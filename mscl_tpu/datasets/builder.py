"""Dataset/pipeline registries and builders.

Parity: reference mmaction/datasets/builder.py:23-25 (DATASETS, PIPELINES,
BLENDINGS registries; build_dataset / build_dataloader). The TPU-native
dataloader differs by design: a single host process assembles the *global*
batch (numpy, NTHWC) which pjit then shards over the DP mesh axis — there is
no per-rank DistributedSampler because JAX SPMD is single-program.
"""
from __future__ import annotations

from ..registry import Registry, build_from_cfg

DATASETS = Registry('dataset')
PIPELINES = Registry('pipeline')
BLENDINGS = Registry('blending')


def build_dataset(cfg, default_args=None):
    """Build a dataset; supports RepeatDataset/ConcatDataset wrappers
    (reference datasets/builder.py:28-40)."""
    if cfg['type'] == 'RepeatDataset':
        from .dataset_wrappers import RepeatDataset
        return RepeatDataset(
            build_dataset(cfg['dataset'], default_args), cfg['times'])
    if cfg['type'] == 'ConcatDataset':
        from .dataset_wrappers import ConcatDataset
        return ConcatDataset(
            [build_dataset(c, default_args) for c in cfg['datasets']])
    return build_from_cfg(cfg, DATASETS, default_args)


def build_dataloader(dataset,
                     videos_per_gpu,
                     workers_per_gpu=0,
                     num_gpus=1,
                     shuffle=True,
                     seed=None,
                     drop_last=False,
                     prefetch=2,
                     **kwargs):
    """Build a global-batch numpy dataloader.

    ``videos_per_gpu`` and ``num_gpus`` mirror the reference config keys
    (datasets/builder.py:42-120): the global batch is
    ``videos_per_gpu * num_gpus`` — on TPU this whole batch is built on host
    and sharded over devices by the train step's input sharding.
    """
    from .loader import NumpyLoader
    batch_size = videos_per_gpu * num_gpus
    return NumpyLoader(
        dataset,
        batch_size=batch_size,
        shuffle=shuffle,
        seed=seed,
        drop_last=drop_last,
        num_workers=workers_per_gpu,
        prefetch=prefetch,
        sampler=kwargs.get('sampler'),
        workers_mode=kwargs.get('workers_mode', 'thread'),
    )
