"""<60s flagship health gate (VERDICT r3 weak #1 / next #2).

Round 3 ended with the flagship unable to *initialize* (a missing import
in sepc.py) while the rest of the suite was green — because no fast test
exercised the real TPNMoCo->FPN->SEPC composition that the driver's
bench.py and dryrun_multichip build. This file is that gate: pure
tracing (eval_shape init + eval_shape of one full train step on
ShapeDtypeStructs), no compilation, no execution — it goes red within
seconds of any breakage anywhere in the flagship build/trace path.

Run `python -m pytest -m smoke -q` before EVERY commit.
"""
from functools import partial

import numpy as np
import pytest

pytestmark = pytest.mark.smoke


def _abs(tree):
    import jax
    return jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype),
        tree)


def test_flagship_builds_and_traces_one_step():
    """The exact driver path: _mscl_cfg() -> build -> init_state ->
    make_train_step, all abstract."""
    import jax
    from __graft_entry__ import _mscl_batch, _mscl_cfg
    from mscl_tpu.apis.train import build_model_from_cfg
    from mscl_tpu.core import (build_lr_schedule, build_optimizer,
                               init_state, make_train_step)
    from mscl_tpu.models.recognizers import build_ema_fn, \
        sync_key_variables

    model = build_model_from_cfg(_mscl_cfg(num_frames=4, K=512,
                                           max_iters=100))
    abs_batch = _abs(_mscl_batch(2, num_frames=4, hw=32))
    lr = build_lr_schedule(dict(policy='CosineAnnealing', min_lr=0),
                           0.02, 10, 10)
    tx = build_optimizer(
        dict(type='SGD', lr=0.02, momentum=0.9, weight_decay=1e-4), lr,
        grad_clip=dict(max_norm=40),
        freeze_patterns=('encoder_k', 'neck_k', 'mlp_k'))
    abs_state = jax.eval_shape(
        partial(init_state, model, tx, post_init_fn=sync_key_variables),
        abs_batch)
    out = jax.eval_shape(make_train_step(model, tx, build_ema_fn(model)),
                         abs_state, abs_batch)
    assert out is not None


def test_entry_constructs():
    """entry()'s model-build half (everything except the jitted device
    init, which is execution): cfg parses, model builds, batch shapes."""
    from __graft_entry__ import _mscl_batch, _mscl_cfg
    from mscl_tpu.apis.train import build_model_from_cfg

    model = build_model_from_cfg(_mscl_cfg())
    batch = _mscl_batch(4)
    assert model is not None
    assert batch['imgs'][0].shape == (4, 3, 8, 112, 112)
    assert batch['flow_imgs'][0].shape == (4, 2, 16, 112, 112)


def test_bench_imports_and_builds():
    """bench.py must keep printing ONE json line for the driver; at least
    guard its import + step construction path statically."""
    import importlib.util
    spec = importlib.util.spec_from_file_location('bench', 'bench.py')
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert hasattr(mod, 'main')
