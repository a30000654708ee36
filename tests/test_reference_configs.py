"""Reference-config compatibility sweep.

BASELINE.md's fidelity bar is "mmaction2 config/API semantics": every
model-bearing config file shipped by the reference
(/root/reference/configs/**) must load through our ``Config.fromfile``
(``_base_`` inheritance, del-keys, cfg-options) and construct a model
through ``build_model`` — including the 22 mmdet-style
``type='FastRCNN'`` detection configs (reference
mmaction/models/builder.py:83-86 dispatches those to mmdet; here
``FastRCNN`` maps the same nested roi_head cfg onto the AVA stack).

Construction only (flax module instantiation is parameter-free); the
heavier init/train paths are covered per-family by test_model_zoo.py /
test_e2e_workloads.py.
"""
import os

import pytest

from mscl_tpu.config import Config
from mscl_tpu.models import build_model

REF_CFG_ROOT = '/root/reference/configs'

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_CFG_ROOT),
    reason='reference checkout not mounted')


def _all_reference_configs():
    out = []
    for dirpath, _, files in os.walk(REF_CFG_ROOT):
        for f in sorted(files):
            if f.endswith('.py'):
                out.append(os.path.join(dirpath, f))
    return sorted(out)


def test_reference_config_sweep():
    paths = _all_reference_configs()
    assert len(paths) >= 250, f'reference config tree truncated: {len(paths)}'
    built, model_bearing, failures = 0, 0, []
    for p in paths:
        try:
            cfg = Config.fromfile(p)
        except Exception as e:  # noqa: BLE001 - collect, report all at once
            failures.append(f'{p}: CONFIG {e!r}')
            continue
        if 'model' not in cfg:
            continue
        model_bearing += 1
        try:
            build_model(cfg['model'], train_cfg=cfg.get('train_cfg'),
                        test_cfg=cfg.get('test_cfg'))
            built += 1
        except Exception as e:  # noqa: BLE001
            failures.append(f'{p}: BUILD {e!r}')
    assert not failures, (
        f'{len(failures)} reference configs failed:\n' +
        '\n'.join(failures[:25]))
    # every model-bearing reference config must build (242 at last count)
    assert built == model_bearing
    assert model_bearing >= 240


def test_fastrcnn_reference_cfg_builds_ava_stack():
    cfg = Config.fromfile(os.path.join(
        REF_CFG_ROOT, 'detection/_base_/models/slowonly_r50.py'))
    model = build_model(cfg['model'], train_cfg=cfg.get('train_cfg'),
                        test_cfg=cfg.get('test_cfg'))
    assert type(model).__name__ == 'FastRCNN'
    # the mmdet-shaped cfg must reach the AVA components
    assert model.roi_head['bbox_head']['num_classes'] == 81
    assert model.train_cfg['rcnn']['assigner']['type'] == 'MaxIoUAssignerAVA'


@pytest.mark.parametrize('rel', [
    'detection/_base_/models/slowonly_r50.py',
    'detection/_base_/models/slowonly_r50_nl.py',
])
def test_fastrcnn_reference_cfg_init_traces(rel):
    """eval_shape the FULL init of reference FastRCNN configs (setup +
    forward trace incl. the non-local blocks) — zero FLOPs, catches
    setup-time kwarg/shape bugs that construction alone hides."""
    import jax
    import numpy as np
    cfg = Config.fromfile(os.path.join(REF_CFG_ROOT, rel))
    model = build_model(cfg['model'], train_cfg=cfg.get('train_cfg'),
                        test_cfg=cfg.get('test_cfg'))
    batch = {
        'imgs': np.zeros((1, 3, 4, 64, 64), np.float32),
        'rois': np.zeros((1, 4, 4), np.float32),
        'roi_labels': np.zeros((1, 4, 81), np.float32),
        'roi_weights': np.ones((1, 4), np.float32),
    }
    rngs = {'params': jax.random.PRNGKey(0),
            'dropout': jax.random.PRNGKey(0)}
    shapes = jax.eval_shape(
        lambda b: model.init(rngs, b, method='train_step'), batch)
    assert 'params' in shapes
