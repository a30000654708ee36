"""Init-trace the reference moco/mscl pretrain configs themselves.

The generic reference-config sweep (test_reference_configs.py) can't
derive these batches (two-branch q/k lists + flow), so the flagship
configs were the one family whose reference files were only
construction-checked. Here each file under
/root/reference/configs/recognition/moco/ is built and eval_shape'd
through its full train_step (setup + forward, zero FLOPs) with the
correct batch structure (imgs [q,k]; + flow_imgs [q,k] at 2x temporal
length for the MSCL FRA concat — reference mscl.py:230-238)."""
import os

import numpy as np
import pytest

import jax

from mscl_tpu.config import Config
from mscl_tpu.models import build_model

MOCO_DIR = '/root/reference/configs/recognition/moco'

pytestmark = [
    pytest.mark.skipif(not os.path.isdir(MOCO_DIR),
                       reason='reference checkout not mounted'),
    pytest.mark.slow,  # full moco-config init traces (suite tiering)
]


def _moco_batch(cfg):
    num_frames = 8
    hw = 32
    batch = {'imgs': [np.zeros((1, 3, num_frames, hw, hw), np.float32)
                      for _ in range(2)]}
    model_cfg = cfg['model']
    if 'recognizer_flow' in model_cfg:
        fkey = model_cfg.get('flow_key', 'flow_imgs')
        # MSCLWithAug: base + FRA-rotated flow concatenated along T
        tf = 2 * num_frames if 'WithAug' in model_cfg['type'] \
            else num_frames
        batch[fkey] = [np.zeros((1, 2, tf, hw, hw), np.float32)
                       for _ in range(2)]
    return batch


def test_reference_moco_configs_init_trace():
    rngs = {'params': jax.random.PRNGKey(0),
            'dropout': jax.random.PRNGKey(0),
            'moco': jax.random.PRNGKey(0)}
    failures, ok = [], 0
    for f in sorted(os.listdir(MOCO_DIR)):
        if not f.endswith('.py'):
            continue
        p = os.path.join(MOCO_DIR, f)
        cfg = Config.fromfile(p)
        try:
            model = build_model(cfg['model'],
                                train_cfg=cfg.get('train_cfg'),
                                test_cfg=cfg.get('test_cfg'))
            batch = _moco_batch(cfg)
            shapes = jax.eval_shape(
                lambda b: model.init(rngs, b, method='train_step'),
                batch)
            assert 'params' in shapes
            ok += 1
        except Exception as e:  # noqa: BLE001
            failures.append(f'{p}: {type(e).__name__} {e}')
    assert not failures, '\n'.join(failures)
    assert ok == 6, f'traced {ok}, expected all 6 moco/mscl configs'
