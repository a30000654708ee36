"""Compile-time invariants of the flagship train step's lowered HLO.

Round-3 regression guards for wastes found by tools/analysis/audit_hlo.py
(docs/benchmark.md "HLO-level aug audit"): image-scale scatters (the hue
jitter's `.at[..., 0].set`, the FPN nearest-upsample backward), f32
layout transposes (inputs transposed before the bf16 cast), and f32
elementwise at image scale outside the intentional lp-BN f32 statistics.

Everything here is ABSTRACT — eval_shape init + jit(...).lower() on
ShapeDtypeStructs — so no compilation or execution happens; the test is
pure tracing and runs at a reduced clip geometry (the invariants are
shape-generic).
"""
import re
from functools import partial

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # multi-minute campaign (suite tiering, VERDICT r3 weak #4)


def _nelem(shape_str: str) -> int:
    n = 1
    for p in shape_str.split('x')[:-1]:
        if p.isdigit():
            n *= int(p)
    return n


@pytest.fixture(scope='module')
def step_hlo():
    import jax
    import jax.numpy as jnp
    from __graft_entry__ import _mscl_batch, _mscl_cfg
    from mscl_tpu.apis.train import build_model_from_cfg
    from mscl_tpu.core import (build_lr_schedule, build_optimizer,
                               init_state, make_train_step)
    from mscl_tpu.models.recognizers import build_ema_fn, \
        sync_key_variables

    cfg = _mscl_cfg(num_frames=4, K=512, max_iters=10000)
    dtype = jnp.bfloat16
    cfg['dtype'] = dtype
    cfg['recognizer'] = dict(cfg['recognizer'], dtype=dtype)
    cfg['recognizer_flow'] = dict(cfg['recognizer_flow'], dtype=dtype)
    model = build_model_from_cfg(cfg)
    batch = _mscl_batch(4, num_frames=4)
    lr = build_lr_schedule(dict(policy='CosineAnnealing', min_lr=0),
                           0.02, 10, 100)
    tx = build_optimizer(
        dict(type='SGD', lr=0.02, momentum=0.9, weight_decay=1e-4), lr,
        grad_clip=dict(max_norm=40),
        freeze_patterns=('encoder_k', 'neck_k', 'mlp_k'))
    abs_batch = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype),
        batch)
    abs_state = jax.eval_shape(
        partial(init_state, model, tx, post_init_fn=sync_key_variables),
        abs_batch)
    step = make_train_step(model, tx, build_ema_fn(model))
    return jax.jit(step).lower(abs_state, abs_batch).as_text()


# bs 4, T 4 (imgs) / 8 (flow at full 112): smallest pixel tensor is
# (4, 3, 4, 112, 112) ~ 602k elems; anything >= 500k is "image scale"
IMG_SCALE = 500_000


def test_no_image_scale_scatters(step_hlo):
    """Hue jitter + FPN upsample backward must stay scatter-free
    (scatters serialize on TPU)."""
    bad = []
    for line in step_hlo.splitlines():
        if 'stablehlo.scatter' in line:
            m = re.search(r'-> tensor<([^>]+)>', line)
            if m and _nelem(m.group(1)) >= IMG_SCALE:
                bad.append(line.strip()[:120])
    assert not bad, bad


def test_no_f32_layout_transposes(step_hlo):
    """Inputs cast to bf16 BEFORE the NCTHW->NTHWC transpose; no other
    image-scale f32 layout copies may appear."""
    bad = []
    for line in step_hlo.splitlines():
        m = re.search(
            r'stablehlo\.transpose [^:]*: \(tensor<([^>]+f32)>\)', line)
        if m and _nelem(m.group(1)) >= IMG_SCALE:
            bad.append(line.strip()[:120])
    assert not bad, bad


@pytest.mark.parametrize('family,cfg_path,bs,shape', [
    ('tsn', 'configs/_base_/models/tsn_r50.py', 8, (3, 3, 224, 224)),
    ('slowfast', 'configs/_base_/models/slowfast_r50.py', 2,
     (3, 32, 224, 224)),
    ('x3d', 'configs/recognition/x3d/'
     'x3d_m_16x5x1_facebook_kinetics400_rgb.py', 2, (3, 16, 224, 224)),
])
def test_zoo_step_free_of_image_scale_gathers(family, cfg_path, bs, shape):
    """Zoo train steps must not gather/scatter or f32-transpose at image
    scale: jnp's strided basic indexing (the SlowFast pathway split)
    lowers to a gather, and f32 inputs must cast before the NTHWC
    transpose. Abstract lowering only — no execution."""
    import jax
    import jax.numpy as jnp
    from mscl_tpu.config import Config
    from mscl_tpu.apis.train import build_model_from_cfg
    from mscl_tpu.core import (build_lr_schedule, build_optimizer,
                               init_state, make_train_step)
    cfg = Config.fromfile(cfg_path)
    model = build_model_from_cfg(dict(cfg['model']), dtype=jnp.bfloat16)
    batch = {'imgs': np.zeros((bs,) + shape, np.float32),
             'label': np.zeros((bs,), np.int64)}
    lr = build_lr_schedule(dict(policy='fixed'), 0.01, 1, 1)
    tx = build_optimizer(dict(type='SGD', lr=0.01, momentum=0.9,
                              weight_decay=1e-4), lr,
                         grad_clip=dict(max_norm=40))
    abs_batch = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype),
        batch)
    abs_state = jax.eval_shape(partial(init_state, model, tx), abs_batch)
    txt = jax.jit(make_train_step(model, tx)).lower(
        abs_state, abs_batch).as_text()
    thr = bs * 3 * 56 * 56
    bad = []
    for line in txt.splitlines():
        for pat, what in ((r'stablehlo\.gather.*-> tensor<([^>]+)>',
                           'gather'),
                          (r'stablehlo\.scatter.*-> tensor<([^>]+)>',
                           'scatter'),
                          (r'stablehlo\.transpose [^:]*: '
                           r'\(tensor<([^>]+f32)>\)', 'f32transpose')):
            m = re.search(pat, line)
            if m and _nelem(m.group(1)) >= thr:
                bad.append(f'{what}: {line.strip()[:100]}')
    assert not bad, bad


def test_no_f32_elementwise_on_pixel_tensors(step_hlo):
    """Jitter/blur/normalize and the stacked wheel output run in the
    model dtype: no image-scale f32 elementwise op may touch a
    pixel-shaped tensor (trailing channel dim <= 4). lp-BN f32
    statistics (channel dims 16..512) and the wheel's channel-less
    internal f32 math are intentionally excluded."""
    bad = []
    for line in step_hlo.splitlines():
        m = re.search(r'stablehlo\.(\w+)[^:]*: tensor<([^>]+f32)>$',
                      line.strip())
        if not m or _nelem(m.group(2)) < IMG_SCALE:
            continue
        dims = [int(p) for p in m.group(2).split('x')[:-1] if p.isdigit()]
        if dims and dims[-1] <= 4:
            bad.append(f'{m.group(1)} {m.group(2)}')
    assert not bad, bad
