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
