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
           if f'{osp.sep}_base_{osp.sep}' not in p]


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


# full-config init traces: every recognition family's shipped recipe,
# traced through setup + forward with eval_shape (zero FLOPs). Catches
# cfg-to-module kwarg/shape mismatches that construction alone hides
# (this class of check found the SlowFastHead spatial_type and TPN
# wiring bugs in round 3).
ZOO_INIT_SPECS = {
    'recognition/c3d/c3d_sports1m_16x1x1_45e_ucf101_rgb.py':
        ('imgs3d', (1, 3, 16, 112, 112)),
    'recognition/x3d/x3d_s_13x6x1_facebook_kinetics400_rgb.py':
        ('imgs3d', (1, 3, 13, 64, 64)),
    'recognition/csn/ircsn_r152_32x2x1_180e_kinetics400_rgb.py':
        ('imgs3d', (1, 3, 8, 64, 64)),
    'recognition/r2plus1d/r2plus1d_r18_8x8x1_180e_kinetics400_rgb.py':
        ('imgs3d', (1, 3, 8, 64, 64)),
    'recognition/s3d/s3d_64x1x1_100e_kinetics400_rgb.py':
        ('imgs3d', (1, 3, 16, 64, 64)),
    'recognition/slowfast/slowfast_r101_8x8x1_256e_kinetics400_rgb.py':
        ('imgs3d', (1, 3, 32, 64, 64)),
    'recognition/slowonly/slowonly_r50_4x16x1_256e_kinetics400_flow.py':
        ('imgs3d_flow', (1, 2, 4, 64, 64)),
    'recognition/tanet/tanet_r50_1x1x8_100e_kinetics400_rgb.py':
        ('imgs2d', (1, 8, 3, 64, 64)),
    'recognition/tin/tin_r50_1x1x8_40e_sthv1_rgb.py':
        ('imgs2d', (1, 8, 3, 64, 64)),
    'recognition/trn/trn_r50_1x1x8_50e_sthv1_rgb.py':
        ('imgs2d', (1, 8, 3, 64, 64)),
    'recognition/mobilenet_v2/tsm_mobilenetv2_1x1x8_50e_kinetics400_rgb.py':
        ('imgs2d', (1, 8, 3, 64, 64)),
    'recognition/timesformer/timesformer_divST_8x32x1_15e_kinetics400_rgb.py':
        ('imgs3d', (1, 3, 8, 224, 224)),
    'recognition/tpn/tpn_slowonly_r50_8x8x1_150e_kinetics400_rgb.py':
        ('imgs3d', (1, 3, 8, 64, 64)),
    'recognition/tpn/tpn_tsm_r50_1x1x8_150e_sthv1_rgb.py':
        ('imgs2d', (1, 8, 3, 64, 64)),
    'recognition/tsn/custom_backbones/'
    'tsn_rn101_32x4d_1x1x3_100e_kinetics400_rgb.py':
        ('imgs2d', (1, 3, 3, 64, 64)),
    'recognition/tsn/custom_backbones/'
    'tsn_dense161_1x1x3_100e_kinetics400_rgb.py':
        ('imgs2d', (1, 3, 3, 64, 64)),
    'recognition/tsn/custom_backbones/'
    'tsn_swin_base_1x1x3_100e_kinetics400_rgb.py':
        ('imgs2d', (1, 3, 3, 64, 64)),
    'recognition_audio/resnet/tsn_r50_64x1x1_100e_kinetics400_audio.py':
        ('audio', (1, 1, 64, 80)),
    'skeleton/posec3d/slowonly_r50_u48_240e_ntu60_xsub_keypoint.py':
        ('imgs3d', (1, 17, 48, 56, 56)),
}


@pytest.mark.parametrize('rel,spec', list(ZOO_INIT_SPECS.items()),
                         ids=[osp.basename(k).replace('.py', '')
                              for k in ZOO_INIT_SPECS])
def test_zoo_config_init_traces(rel, spec):
    import jax
    import numpy as np

    from mscl_tpu.apis.train import build_model_from_cfg
    cfg = Config.fromfile(osp.join(CFG_ROOT, rel))
    model = build_model_from_cfg(dict(cfg['model']))
    kind, shape = spec
    key = 'audios' if kind == 'audio' else 'imgs'
    batch = {key: np.zeros(shape, np.float32),
             'label': np.zeros((shape[0],), np.int64)}
    rngs = {'params': jax.random.PRNGKey(0),
            'dropout': jax.random.PRNGKey(0),
            'moco': jax.random.PRNGKey(0)}
    shapes = jax.eval_shape(
        lambda b: model.init(rngs, b, method='train_step'), batch)
    assert 'params' in shapes
