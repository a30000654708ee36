"""SplitBatchNorm (ops/split_bn.py): forward, gradients and running
stats must match flax nn.BatchNorm — only the backward *schedule*
(barrier-detached reductions) may differ."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from mscl_tpu.ops.split_bn import LowPrecisionBatchNorm, SplitBatchNorm


def _pair(dtype, cls=SplitBatchNorm):
    flax_bn = nn.BatchNorm(use_running_average=False, momentum=0.9,
                           epsilon=1e-5, dtype=dtype)
    split_bn = cls(use_running_average=False, momentum=0.9,
                   epsilon=1e-5, dtype=dtype)
    return flax_bn, split_bn


@pytest.mark.parametrize('cls', [SplitBatchNorm, LowPrecisionBatchNorm])
@pytest.mark.parametrize('dtype,tol', [(jnp.float32, 1e-5),
                                       (jnp.bfloat16, 2e-2)])
def test_split_bn_matches_flax(dtype, tol, cls):
    np.random.seed(0)
    x = jnp.asarray(np.random.randn(4, 3, 6, 6, 8) * 2 + 1, dtype)
    w = jnp.asarray(np.random.randn(*x.shape), dtype)
    flax_bn, split_bn = _pair(dtype, cls)
    vf = flax_bn.init(jax.random.PRNGKey(0), x)
    # non-trivial scale/bias
    p = {'scale': jnp.asarray(np.random.rand(8) + 0.5, jnp.float32),
         'bias': jnp.asarray(np.random.randn(8), jnp.float32)}
    variables = {'params': p, 'batch_stats': vf['batch_stats']}

    def run(bn, inp, params):
        variables_ = {'params': params,
                      'batch_stats': vf['batch_stats']}
        y, mut = bn.apply(variables_, inp, mutable=['batch_stats'])
        return y, mut['batch_stats']

    yf, statsf = run(flax_bn, x, p)
    ys, statss = run(split_bn, x, p)
    np.testing.assert_allclose(np.asarray(yf, np.float32),
                               np.asarray(ys, np.float32), atol=tol,
                               rtol=tol)
    for k in ('mean', 'var'):
        np.testing.assert_allclose(np.asarray(statsf[k]),
                                   np.asarray(statss[k]), atol=tol,
                                   rtol=tol)

    def loss(bn):
        def f(inp, params):
            y, _ = bn.apply({'params': params,
                             'batch_stats': vf['batch_stats']}, inp,
                            mutable=['batch_stats'])
            return (y.astype(jnp.float32) *
                    w.astype(jnp.float32)).sum()
        return f

    gx_f, gp_f = jax.grad(loss(flax_bn), argnums=(0, 1))(x, p)
    gx_s, gp_s = jax.grad(loss(split_bn), argnums=(0, 1))(x, p)
    np.testing.assert_allclose(np.asarray(gx_f, np.float32),
                               np.asarray(gx_s, np.float32), atol=tol,
                               rtol=tol)
    for k in ('scale', 'bias'):
        np.testing.assert_allclose(np.asarray(gp_f[k]),
                                   np.asarray(gp_s[k]),
                                   atol=tol * 50, rtol=tol)


@pytest.mark.parametrize('cls', [SplitBatchNorm, LowPrecisionBatchNorm])
def test_split_bn_eval_matches_flax(cls):
    np.random.seed(1)
    x = jnp.asarray(np.random.randn(2, 4, 4, 8), jnp.float32)
    flax_bn = nn.BatchNorm(use_running_average=True, epsilon=1e-5)
    split_bn = cls(use_running_average=True, epsilon=1e-5)
    stats = {'mean': jnp.asarray(np.random.randn(8), jnp.float32),
             'var': jnp.asarray(np.random.rand(8) + 0.3, jnp.float32)}
    p = {'scale': jnp.asarray(np.random.rand(8) + 0.5, jnp.float32),
         'bias': jnp.asarray(np.random.randn(8), jnp.float32)}
    yf = flax_bn.apply({'params': p, 'batch_stats': stats}, x)
    ys = split_bn.apply({'params': p, 'batch_stats': stats}, x)
    np.testing.assert_allclose(np.asarray(yf), np.asarray(ys),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize('impl', ['split', 'lp'])
def test_split_bn_convbn_env_switch(monkeypatch, impl):
    """ConvBN with MSCL_BN_IMPL=split/lp builds the same param tree and
    matches the flax-BN ConvBN forward on shared weights."""
    from mscl_tpu.models.backbones.video_resnet import ConvBN
    np.random.seed(2)
    x = jnp.asarray(np.random.randn(2, 3, 8, 8, 4), jnp.float32)
    blk = ConvBN(8, (3, 3, 3))
    # baseline must be the real flax BN (the repo default is now 'lp')
    monkeypatch.setenv('MSCL_BN_IMPL', 'flax')
    v = blk.init({'params': jax.random.PRNGKey(0)}, x, train=True)
    y_flax, _ = blk.apply(v, x, train=True, mutable=['batch_stats'])
    monkeypatch.setenv('MSCL_BN_IMPL', impl)
    v2 = blk.init({'params': jax.random.PRNGKey(0)}, x, train=True)
    assert jax.tree_util.tree_structure(v2) == \
        jax.tree_util.tree_structure(v)
    y_split, _ = blk.apply(v, x, train=True, mutable=['batch_stats'])
    np.testing.assert_allclose(np.asarray(y_flax), np.asarray(y_split),
                               atol=1e-5, rtol=1e-5)
