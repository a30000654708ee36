"""All shipped configs must load, and every type= they reference must
resolve in the registries (catching the reference's registration gap
class of bug, SURVEY §2.1)."""
import glob
import os.path as osp

import pytest

from mscl_tpu import Config
from mscl_tpu.datasets import DATASETS, PIPELINES
from mscl_tpu.models import MODELS, SSL_AUGS

CFG_ROOT = osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
                    'configs')
CONFIGS = [p for p in glob.glob(f'{CFG_ROOT}/**/*.py', recursive=True)
           if '_base_' not in p]


def iter_types(node, key_path=''):
    if isinstance(node, dict):
        if 'type' in node and isinstance(node['type'], str):
            yield node['type'], key_path
        for k, v in node.items():
            yield from iter_types(v, f'{key_path}.{k}')
    elif isinstance(node, (list, tuple)):
        for v in node:
            yield from iter_types(v, key_path)


@pytest.mark.parametrize('cfg_path', CONFIGS,
                         ids=[osp.basename(p) for p in CONFIGS])
def test_config_types_resolve(cfg_path):
    cfg = Config.fromfile(cfg_path)
    assert 'model' in cfg
    unresolved = []
    for type_name, where in iter_types(cfg.to_dict()):
        if type_name in ('TextLoggerHook', 'TensorboardLoggerHook',
                         'SGD', 'Adam', 'AdamW', 'CopyOfSGD'):
            continue  # hooks/optimizers are Runner/optax built-ins
        if type_name in ('AvgConsensus', 'STPPTrain', 'STPPTest',
                         'MaxIoUAssignerAVA', 'RandomSampler',
                         'resnet3d', 'non_local', 'AVARoIHead', 'BN3d',
                         'avg', 'max'):
            # structural descriptors consumed by their owners (heads'
            # consensus, core.bbox assigner/sampler, slowfast pathways),
            # not registry-built modules
            continue
        if not (type_name in MODELS or type_name in DATASETS or
                type_name in PIPELINES or type_name in SSL_AUGS):
            unresolved.append((type_name, where))
    assert not unresolved, unresolved


def test_reference_dataset_alias():
    # configs written against the reference still build
    assert 'RedisRawframeDataset' in DATASETS
    assert 'NoriDecode' in PIPELINES


@pytest.mark.parametrize('cfg_path', CONFIGS,
                         ids=[osp.basename(p) for p in CONFIGS])
def test_config_model_constructs(cfg_path):
    """Construct the model object from every shipped config — catches
    unexpected-kwarg mismatches that registry resolution misses
    (flax dataclass construction is cheap; no init/forward)."""
    from mscl_tpu.apis.train import build_model_from_cfg
    cfg = Config.fromfile(cfg_path)
    model_cfg = {k: v for k, v in dict(cfg.model).items()}
    model = build_model_from_cfg(model_cfg)
    assert model is not None


BASE_MODEL_INPUTS = {
    '_base_/models/tsn_r50.py': ('2d', (1, 3, 3, 64, 64)),
    '_base_/models/tsm_r50.py': ('2d', (1, 8, 3, 64, 64)),
    '_base_/models/i3d_r50.py': ('3d', (1, 3, 8, 64, 64)),
    '_base_/models/slowonly_r50.py': ('3d', (1, 3, 4, 64, 64)),
    '_base_/models/slowfast_r50.py': ('3d', (1, 3, 32, 64, 64)),
}


@pytest.mark.parametrize('rel,spec', list(BASE_MODEL_INPUTS.items()),
                         ids=[osp.basename(k) for k in BASE_MODEL_INPUTS])
def test_base_model_init_traces(rel, spec):
    """jax.eval_shape the full init — runs setup() and the forward
    trace (catching unexpected-kwarg and shape bugs that lazy dataclass
    construction hides) with zero FLOPs."""
    import jax
    import numpy as np

    from mscl_tpu.apis.train import build_model_from_cfg
    cfg = Config.fromfile(osp.join(CFG_ROOT, rel))
    model = build_model_from_cfg(dict(cfg['model']))
    _, shape = spec
    batch = {'imgs': np.zeros(shape, np.float32),
             'label': np.zeros((shape[0],), np.int64)}
    rngs = {'params': jax.random.PRNGKey(0),
            'dropout': jax.random.PRNGKey(0),
            'moco': jax.random.PRNGKey(0)}
    shapes = jax.eval_shape(
        lambda b: model.init(rngs, b, method='train_step'), batch)
    assert 'params' in shapes
