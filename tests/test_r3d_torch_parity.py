"""Whole-network numeric parity: our flax r3d (torchvision semantics) vs
an independently hand-built torch implementation of the same architecture
with shared weights (eval mode). Catches any layout/padding/stride/BN
mismatch that single-op tests would miss."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn

from mscl_tpu.models import BACKBONES
from mscl_tpu.models.backbones.video_resnet import VideoResNet

pytestmark = pytest.mark.slow  # multi-minute campaign (suite tiering, VERDICT r3 weak #4)


def torch_basic_stem(cin, cout, kernel, stride, pad):
    return tnn.Sequential(
        tnn.Conv3d(cin, cout, kernel, stride=stride, padding=pad,
                   bias=False),
        tnn.BatchNorm3d(cout), tnn.ReLU())


class TorchBasicBlock(tnn.Module):
    """torchvision VideoResNet BasicBlock with Conv3DSimple."""

    def __init__(self, cin, planes, stride=1):
        super().__init__()
        self.conv1 = tnn.Sequential(
            tnn.Conv3d(cin, planes, 3, stride=(stride,) * 3, padding=1,
                       bias=False),
            tnn.BatchNorm3d(planes), tnn.ReLU())
        self.conv2 = tnn.Sequential(
            tnn.Conv3d(planes, planes, 3, padding=1, bias=False),
            tnn.BatchNorm3d(planes))
        self.downsample = None
        if stride != 1 or cin != planes:
            self.downsample = tnn.Sequential(
                tnn.Conv3d(cin, planes, 1, stride=(stride,) * 3,
                           bias=False),
                tnn.BatchNorm3d(planes))
        self.relu = tnn.ReLU()

    def forward(self, x):
        res = x
        out = self.conv2(self.conv1(x))
        if self.downsample is not None:
            res = self.downsample(x)
        return self.relu(out + res)


class TorchTinyR3D(tnn.Module):
    """2-stage slice of r3d_18 (stem + layer1(1 block) + layer2(1 block))
    — enough depth to exercise stem geometry, striding, residuals, BN."""

    def __init__(self, width=8):
        super().__init__()
        self.stem = torch_basic_stem(3, width, (3, 7, 7), (1, 2, 2),
                                     (1, 3, 3))
        self.layer1 = TorchBasicBlock(width, width, 1)
        self.layer2 = TorchBasicBlock(width, width * 2, 2)

    def forward(self, x):
        return self.layer2(self.layer1(self.stem(x)))


def copy_convbn(params, stats, torch_conv, torch_bn):
    torch_conv.weight.data = torch.from_numpy(
        np.transpose(np.asarray(params['conv']['kernel']),
                     (4, 3, 0, 1, 2)).copy())
    torch_bn.weight.data = torch.from_numpy(
        np.asarray(params['bn']['scale']).copy())
    torch_bn.bias.data = torch.from_numpy(
        np.asarray(params['bn']['bias']).copy())
    torch_bn.running_mean.data = torch.from_numpy(
        np.asarray(stats['bn']['mean']).copy())
    torch_bn.running_var.data = torch.from_numpy(
        np.asarray(stats['bn']['var']).copy())


def test_two_stage_r3d_matches_torch():
    rng = np.random.default_rng(0)
    width = 8
    model = VideoResNet(block='basic', conv_makers=('simple3d',) * 4,
                        layers=(1, 1, 1, 1), stem='r3d', base_width=width,
                        out_indices=(0, 1))
    x = rng.normal(size=(2, 6, 32, 32, 3)).astype(np.float32)
    with jax.default_matmul_precision('highest'):
        variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
        # randomize BN stats so eval-mode normalization is non-trivial
        def randomize(stats):
            return jax.tree.map(
                lambda v: jnp.asarray(
                    rng.uniform(0.5, 1.5, v.shape).astype(np.float32)),
                stats)
        variables = {'params': variables['params'],
                     'batch_stats': randomize(variables['batch_stats'])}
        out_jax = model.apply(variables, jnp.asarray(x), train=False)

    tm = TorchTinyR3D(width).eval()
    p = jax.device_get(variables['params'])
    s = jax.device_get(variables['batch_stats'])
    copy_convbn(p['stem'], s['stem'], tm.stem[0], tm.stem[1])
    for jax_name, tblock in (('layer1_0', tm.layer1),
                             ('layer2_0', tm.layer2)):
        copy_convbn(p[jax_name]['conv1'], s[jax_name]['conv1'],
                    tblock.conv1[0], tblock.conv1[1])
        copy_convbn(p[jax_name]['conv2'], s[jax_name]['conv2'],
                    tblock.conv2[0], tblock.conv2[1])
        if 'downsample' in p[jax_name]:
            copy_convbn(p[jax_name]['downsample'],
                        s[jax_name]['downsample'],
                        tblock.downsample[0], tblock.downsample[1])

    with torch.no_grad():
        xt = torch.from_numpy(x).permute(0, 4, 1, 2, 3)  # NCTHW
        out_t = tm(xt).permute(0, 2, 3, 4, 1).numpy()

    out2 = np.asarray(out_jax[1])
    assert out2.shape == out_t.shape
    np.testing.assert_allclose(out2, out_t, rtol=1e-3, atol=1e-3)


class TorchConv2Plus1D(tnn.Sequential):
    """torchvision Conv2Plus1D: 1x3x3 conv -> BN -> ReLU -> 3x1x1."""

    def __init__(self, cin, cout, mid, stride=1):
        super().__init__(
            tnn.Conv3d(cin, mid, (1, 3, 3), stride=(1, stride, stride),
                       padding=(0, 1, 1), bias=False),
            tnn.BatchNorm3d(mid), tnn.ReLU(),
            tnn.Conv3d(mid, cout, (3, 1, 1), stride=(stride, 1, 1),
                       padding=(1, 0, 0), bias=False))


class TorchR2Plus1dBlock(tnn.Module):

    def __init__(self, cin, planes, stride=1):
        super().__init__()

        def midplanes(ci, co):
            return (ci * co * 3 * 3 * 3) // (ci * 3 * 3 + 3 * co)

        self.conv1 = tnn.Sequential(
            TorchConv2Plus1D(cin, planes, midplanes(cin, planes),
                             stride),
            tnn.BatchNorm3d(planes), tnn.ReLU())
        self.conv2 = tnn.Sequential(
            TorchConv2Plus1D(planes, planes,
                             midplanes(planes, planes)),
            tnn.BatchNorm3d(planes))
        self.downsample = None
        if stride != 1 or cin != planes:
            self.downsample = tnn.Sequential(
                tnn.Conv3d(cin, planes, 1, stride=(stride,) * 3,
                           bias=False),
                tnn.BatchNorm3d(planes))
        self.relu = tnn.ReLU()

    def forward(self, x):
        res = x
        out = self.conv2(self.conv1(x))
        if self.downsample is not None:
            res = self.downsample(x)
        return self.relu(out + res)


class TorchTinyR2Plus1d(tnn.Module):
    """Stem + one stride-1 block + one stride-2 block of r2plus1d_18
    (torchvision R2Plus1dStem geometry with 45-channel mid)."""

    def __init__(self, width=8):
        super().__init__()
        self.stem = tnn.Sequential(
            tnn.Conv3d(3, 45, (1, 7, 7), stride=(1, 2, 2),
                       padding=(0, 3, 3), bias=False),
            tnn.BatchNorm3d(45), tnn.ReLU(),
            tnn.Conv3d(45, width, (3, 1, 1), stride=1,
                       padding=(1, 0, 0), bias=False),
            tnn.BatchNorm3d(width), tnn.ReLU())
        self.layer1 = TorchR2Plus1dBlock(width, width, 1)
        self.layer2 = TorchR2Plus1dBlock(width, width * 2, 2)

    def forward(self, x):
        return self.layer2(self.layer1(self.stem(x)))


def copy_conv(params, torch_conv):
    torch_conv.weight.data = torch.from_numpy(
        np.transpose(np.asarray(params['kernel']),
                     (4, 3, 0, 1, 2)).copy())


def copy_bn(params, stats, torch_bn):
    torch_bn.weight.data = torch.from_numpy(
        np.asarray(params['scale']).copy())
    torch_bn.bias.data = torch.from_numpy(
        np.asarray(params['bias']).copy())
    torch_bn.running_mean.data = torch.from_numpy(
        np.asarray(stats['mean']).copy())
    torch_bn.running_var.data = torch.from_numpy(
        np.asarray(stats['var']).copy())


def test_two_stage_r2plus1d_matches_torch():
    """R(2+1)D factorized blocks + stem vs hand-built torch (shared
    weights, eval mode) — guards the midplane formula, the mid-BN/ReLU
    placement inside Conv2Plus1D and the (2+1)D striding."""
    from mscl_tpu.models.builder import build_backbone
    rng = np.random.default_rng(1)
    width = 8
    model = build_backbone(dict(type='ResNet2Plus1d', depth=18,
                                base_width=width, layers=(1, 1)))
    x = rng.normal(size=(2, 6, 32, 32, 3)).astype(np.float32)
    with jax.default_matmul_precision('highest'):
        variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))

        def randomize(stats):
            return jax.tree.map(
                lambda v: jnp.asarray(
                    rng.uniform(0.5, 1.5, v.shape).astype(np.float32)),
                stats)
        variables = {'params': variables['params'],
                     'batch_stats': randomize(variables['batch_stats'])}
        out_jax = model.apply(variables, jnp.asarray(x), train=False)

    tm = TorchTinyR2Plus1d(width).eval()
    p = jax.device_get(variables['params'])
    s = jax.device_get(variables['batch_stats'])
    copy_conv(p['stem_s']['conv'], tm.stem[0])
    copy_bn(p['stem_s']['bn'], s['stem_s']['bn'], tm.stem[1])
    copy_conv(p['stem_t']['conv'], tm.stem[3])
    copy_bn(p['stem_t']['bn'], s['stem_t']['bn'], tm.stem[4])
    for jname, tblock in (('layer1_0', tm.layer1),
                          ('layer2_0', tm.layer2)):
        jp, js = p[jname], s[jname]
        for cname, tconv in (('conv1', tblock.conv1),
                             ('conv2', tblock.conv2)):
            copy_conv(jp[f'{cname}_s']['conv'], tconv[0][0])
            copy_bn(jp[f'{cname}_s']['bn'], js[f'{cname}_s']['bn'],
                    tconv[0][1])
            copy_conv(jp[f'{cname}_t'], tconv[0][3])
        copy_bn(jp['bn1'], js['bn1'], tblock.conv1[1])
        copy_bn(jp['bn2'], js['bn2'], tblock.conv2[1])
        if 'downsample' in jp:
            copy_conv(jp['downsample']['conv'], tblock.downsample[0])
            copy_bn(jp['downsample']['bn'], js['downsample']['bn'],
                    tblock.downsample[1])

    with torch.no_grad():
        xt = torch.from_numpy(x).permute(0, 4, 1, 2, 3)
        out_t = tm(xt).permute(0, 2, 3, 4, 1).numpy()

    out2 = np.asarray(out_jax[1])
    assert out2.shape == out_t.shape
    np.testing.assert_allclose(out2, out_t, rtol=1e-3, atol=1e-3)


class TorchCSNBottleneck(tnn.Module):
    """ir-CSN bottleneck: 1x1x1 -> depthwise 3x3x3 -> 1x1x1 (reference
    resnet3d_csn.py CSNBottleneck3d, ir mode)."""

    def __init__(self, cin, planes, s_sp=1, s_t=1):
        super().__init__()
        self.conv1 = tnn.Sequential(
            tnn.Conv3d(cin, planes, 1, bias=False),
            tnn.BatchNorm3d(planes), tnn.ReLU())
        self.conv2 = tnn.Sequential(
            tnn.Conv3d(planes, planes, 3, stride=(s_t, s_sp, s_sp),
                       padding=1, groups=planes, bias=False),
            tnn.BatchNorm3d(planes), tnn.ReLU())
        self.conv3 = tnn.Sequential(
            tnn.Conv3d(planes, planes * 4, 1, bias=False),
            tnn.BatchNorm3d(planes * 4))
        self.downsample = None
        if s_sp != 1 or s_t != 1 or cin != planes * 4:
            self.downsample = tnn.Sequential(
                tnn.Conv3d(cin, planes * 4, 1,
                           stride=(s_t, s_sp, s_sp), bias=False),
                tnn.BatchNorm3d(planes * 4))
        self.relu = tnn.ReLU()

    def forward(self, x):
        res = x if self.downsample is None else self.downsample(x)
        return self.relu(self.conv3(self.conv2(self.conv1(x))) + res)


def test_csn_bottleneck_matches_torch():
    """Depthwise-separated bottleneck vs torch grouped conv (shared
    weights, eval): guards the feature_group_count depthwise kernel
    layout and the ir-CSN block wiring."""
    from mscl_tpu.models.backbones.resnet3d import _CSNBottleneck
    rng = np.random.default_rng(2)
    planes = 4
    cin = 8
    block = _CSNBottleneck(planes, spatial_stride=2, temporal_stride=2,
                           downsample=True)
    x = rng.normal(size=(2, 4, 8, 8, cin)).astype(np.float32)
    with jax.default_matmul_precision('highest'):
        v = block.init(jax.random.PRNGKey(0), jnp.asarray(x))
        rngs = np.random.default_rng(3)

        def randomize(stats):
            return jax.tree.map(
                lambda a: jnp.asarray(
                    rngs.uniform(0.5, 1.5, a.shape).astype(np.float32)),
                stats)
        v = {'params': v['params'],
             'batch_stats': randomize(v['batch_stats'])}
        out_jax = block.apply(v, jnp.asarray(x), train=False)

    tb = TorchCSNBottleneck(cin, planes, 2, 2).eval()
    p = jax.device_get(v['params'])
    s = jax.device_get(v['batch_stats'])
    copy_conv(p['conv1']['conv'], tb.conv1[0])
    copy_bn(p['conv1']['bn'], s['conv1']['bn'], tb.conv1[1])
    # depthwise: flax kernel (3,3,3,1,planes) -> torch (planes,1,3,3,3)
    tb.conv2[0].weight.data = torch.from_numpy(
        np.transpose(np.asarray(p['conv2_dw']['kernel']),
                     (4, 3, 0, 1, 2)).copy())
    copy_bn(p['conv2_bn'], s['conv2_bn'], tb.conv2[1])
    copy_conv(p['conv3']['conv'], tb.conv3[0])
    copy_bn(p['conv3']['bn'], s['conv3']['bn'], tb.conv3[1])
    copy_conv(p['downsample']['conv'], tb.downsample[0])
    copy_bn(p['downsample']['bn'], s['downsample']['bn'],
            tb.downsample[1])

    with torch.no_grad():
        xt = torch.from_numpy(x).permute(0, 4, 1, 2, 3)
        out_t = tb(xt).permute(0, 2, 3, 4, 1).numpy()
    np.testing.assert_allclose(np.asarray(out_jax), out_t, rtol=1e-3,
                               atol=1e-3)


class TorchTAM(tnn.Module):
    """TAM per the published TANet module (reference mmaction tam.py):
    global branch Linear(T,aT)/BN/ReLU/Linear(aT,K)/Softmax produces a
    per-(video,channel) temporal kernel; local branch
    Conv1d(C,C/b,3)/BN/ReLU/Conv1d(C/b,C,1)/Sigmoid gates frames."""

    def __init__(self, t=4, c=8, alpha=2, k=3, beta=4):
        super().__init__()
        self.t, self.k = t, k
        self.G = tnn.Sequential(
            tnn.Linear(t, t * alpha, bias=False),
            tnn.BatchNorm1d(t * alpha), tnn.ReLU(),
            tnn.Linear(t * alpha, k, bias=False), tnn.Softmax(-1))
        self.L = tnn.Sequential(
            tnn.Conv1d(c, c // beta, 3, padding=1, bias=False),
            tnn.BatchNorm1d(c // beta), tnn.ReLU(),
            tnn.Conv1d(c // beta, c, 1, bias=False), tnn.Sigmoid())

    def forward(self, x):                       # (N*T, C, H, W)
        nt, c, h, w = x.shape
        n, t, k = nt // self.t, self.t, self.k
        xt = x.view(n, t, c, h, w)
        theta = xt.mean(dim=(3, 4))             # (N, T, C)
        kernel = self.G(theta.permute(0, 2, 1).reshape(n * c, t))
        attn = self.L(theta.permute(0, 2, 1))   # (N, C, T)
        xt = xt * attn.permute(0, 2, 1)[:, :, :, None, None]
        seq = xt.permute(0, 2, 1, 3, 4).reshape(n * c, t, h * w)
        seq = torch.nn.functional.pad(seq, (0, 0, k // 2, k // 2))
        out = sum(kernel[:, i][:, None, None] * seq[:, i:i + t]
                  for i in range(k))
        out = out.view(n, c, t, h, w).permute(0, 2, 1, 3, 4)
        return out.reshape(nt, c, h, w)


def test_tam_matches_torch():
    """Guards the ADVICE round-1 findings: TAM width/placement and the
    1x1 second local conv."""
    from mscl_tpu.models.backbones.tanet import TAM
    rng = np.random.default_rng(4)
    t, c = 4, 8
    tam = TAM(num_segments=t)
    x = rng.normal(size=(2 * t, 6, 6, c)).astype(np.float32)
    with jax.default_matmul_precision('highest'):
        v = tam.init(jax.random.PRNGKey(0), jnp.asarray(x))
        out_jax = tam.apply(v, jnp.asarray(x), train=False)

    tm = TorchTAM(t=t, c=c).eval()
    p = jax.device_get(v['params'])
    s = jax.device_get(v['batch_stats'])
    tm.G[0].weight.data = torch.from_numpy(
        np.asarray(p['g_fc1']['kernel']).T.copy())
    copy_bn(p['g_bn'], s['g_bn'], tm.G[1])
    tm.G[3].weight.data = torch.from_numpy(
        np.asarray(p['g_fc2']['kernel']).T.copy())
    # flax Conv kernel (k, Cin, Cout) -> torch Conv1d (Cout, Cin, k)
    tm.L[0].weight.data = torch.from_numpy(np.transpose(
        np.asarray(p['l_conv1']['kernel']), (2, 1, 0)).copy())
    copy_bn(p['l_bn'], s['l_bn'], tm.L[1])
    tm.L[3].weight.data = torch.from_numpy(np.transpose(
        np.asarray(p['l_conv2']['kernel']), (2, 1, 0)).copy())

    with torch.no_grad():
        xt = torch.from_numpy(x).permute(0, 3, 1, 2)
        out_t = tm(xt).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(out_jax), out_t, rtol=1e-3,
                               atol=1e-3)


class TorchBlockX3D(tnn.Module):
    """X3D bottleneck (reference x3d.py BlockX3D): 1x1x1 expand ->
    depthwise 3x3x3 -> SE -> swish -> 1x1x1 project, relu(out + res)."""

    def __init__(self, cin, planes, outplanes, stride=1, se_red=4):
        super().__init__()
        self.conv1 = tnn.Conv3d(cin, planes, 1, bias=False)
        self.bn1 = tnn.BatchNorm3d(planes)
        self.conv2 = tnn.Conv3d(planes, planes, 3,
                                stride=(1, stride, stride), padding=1,
                                groups=planes, bias=False)
        self.bn2 = tnn.BatchNorm3d(planes)
        self.se_fc1 = tnn.Conv3d(planes, se_red, 1)
        self.se_fc2 = tnn.Conv3d(se_red, planes, 1)
        self.conv3 = tnn.Conv3d(planes, outplanes, 1, bias=False)
        self.bn3 = tnn.BatchNorm3d(outplanes)
        self.downsample = None
        if stride != 1 or cin != outplanes:
            self.downsample = tnn.Sequential(
                tnn.Conv3d(cin, outplanes, 1,
                           stride=(1, stride, stride), bias=False),
                tnn.BatchNorm3d(outplanes))

    def forward(self, x):
        res = x if self.downsample is None else self.downsample(x)
        y = torch.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        s = y.mean(dim=(2, 3, 4), keepdim=True)
        s = self.se_fc2(torch.relu(self.se_fc1(s)))
        y = y * torch.sigmoid(s)
        y = y * torch.sigmoid(y)            # swish
        y = self.bn3(self.conv3(y))
        return torch.relu(y + res)


def test_x3d_block_matches_torch():
    """Guards SE placement (inside the depthwise branch, before swish)
    and the depthwise/expand channel plumbing of BlockX3D."""
    from mscl_tpu.models.backbones.x3d import BlockX3D, _round_width
    rng = np.random.default_rng(5)
    cin, planes, outp = 8, 16, 8
    block = BlockX3D(planes, outp, spatial_stride=2, downsample=True)
    x = rng.normal(size=(2, 4, 8, 8, cin)).astype(np.float32)
    with jax.default_matmul_precision('highest'):
        v = block.init(jax.random.PRNGKey(0), jnp.asarray(x))
        rr = np.random.default_rng(6)

        def randomize(stats):
            return jax.tree.map(
                lambda a: jnp.asarray(
                    rr.uniform(0.5, 1.5, a.shape).astype(np.float32)),
                stats)
        v = {'params': v['params'],
             'batch_stats': randomize(v['batch_stats'])}
        out_jax = block.apply(v, jnp.asarray(x), train=False)

    se_red = _round_width(planes, 0.0625)
    tb = TorchBlockX3D(cin, planes, outp, 2, se_red).eval()
    p = jax.device_get(v['params'])
    s = jax.device_get(v['batch_stats'])

    def setw(tmod, kern):
        tmod.weight.data = torch.from_numpy(np.transpose(
            np.asarray(kern), (4, 3, 0, 1, 2)).copy())

    setw(tb.conv1, p['conv1']['kernel'])
    copy_bn(p['bn1'], s['bn1'], tb.bn1)
    setw(tb.conv2, p['conv2']['kernel'])
    copy_bn(p['bn2'], s['bn2'], tb.bn2)
    setw(tb.se_fc1, p['se']['fc1']['kernel'])
    tb.se_fc1.bias.data = torch.from_numpy(
        np.asarray(p['se']['fc1']['bias']).copy())
    setw(tb.se_fc2, p['se']['fc2']['kernel'])
    tb.se_fc2.bias.data = torch.from_numpy(
        np.asarray(p['se']['fc2']['bias']).copy())
    setw(tb.conv3, p['conv3']['kernel'])
    copy_bn(p['bn3'], s['bn3'], tb.bn3)
    setw(tb.downsample[0], p['downsample']['kernel'])
    copy_bn(p['downsample_bn'], s['downsample_bn'], tb.downsample[1])

    with torch.no_grad():
        xt = torch.from_numpy(x).permute(0, 4, 1, 2, 3)
        out_t = tb(xt).permute(0, 2, 3, 4, 1).numpy()
    np.testing.assert_allclose(np.asarray(out_jax), out_t, rtol=1e-3,
                               atol=1e-3)


class TorchMHSA(tnn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.h = heads
        self.qkv = tnn.Linear(dim, 3 * dim)
        self.proj = tnn.Linear(dim, dim)

    def forward(self, x):
        b, n, c = x.shape
        h = self.h
        qkv = self.qkv(x).view(b, n, 3, h, c // h)
        q, k, v = [t.squeeze(2).permute(0, 2, 1, 3)
                   for t in qkv.split(1, dim=2)]
        attn = torch.softmax(
            q @ k.transpose(-1, -2) / (c // h) ** 0.5, dim=-1)
        out = (attn @ v).permute(0, 2, 1, 3).reshape(b, n, c)
        return self.proj(out)


class TorchDividedBlock(tnn.Module):
    """TimeSformer divided space-time attention block (paper form:
    temporal attn over same-patch tokens + temporal_fc, spatial attn
    per frame with broadcast cls averaged back, then MLP)."""

    def __init__(self, dim, heads, t):
        super().__init__()
        self.t = t
        self.norm_t = tnn.LayerNorm(dim)
        self.temporal_attn = TorchMHSA(dim, heads)
        self.temporal_fc = tnn.Linear(dim, dim)
        self.norm_s = tnn.LayerNorm(dim)
        self.spatial_attn = TorchMHSA(dim, heads)
        self.norm2 = tnn.LayerNorm(dim)
        self.fc1 = tnn.Linear(dim, dim * 4)
        self.fc2 = tnn.Linear(dim * 4, dim)

    def forward(self, x):
        b, n, c = x.shape
        t = self.t
        p = (n - 1) // t
        xt = x[:, 1:].view(b, t, p, c).permute(0, 2, 1, 3)
        xt = xt.reshape(b * p, t, c)
        xt = xt + self.temporal_fc(self.temporal_attn(self.norm_t(xt)))
        xt = xt.view(b, p, t, c).permute(0, 2, 1, 3)
        x = torch.cat([x[:, :1], xt.reshape(b, t * p, c)], dim=1)
        cls = x[:, :1]
        xs = x[:, 1:].reshape(b * t, p, c)
        xs = torch.cat([cls.repeat_interleave(t, dim=0), xs], dim=1)
        res = self.spatial_attn(self.norm_s(xs))
        cls_out = res[:, 0].view(b, t, c).mean(dim=1, keepdim=True)
        patch_out = res[:, 1:].reshape(b, t * p, c)
        x = x + torch.cat([cls_out, patch_out], dim=1)
        return x + self.fc2(torch.nn.functional.gelu(
            self.fc1(self.norm2(x))))


def test_timesformer_divided_block_matches_torch():
    """Guards the b/t/p token reshapes, the cls broadcast/average and
    the temporal_fc residual of divided space-time attention."""
    from mscl_tpu.models.backbones.timesformer import DividedBlock
    rng = np.random.default_rng(7)
    dim, heads, t, p = 16, 4, 3, 4
    block = DividedBlock(dim, heads, t)
    x = rng.normal(size=(2, 1 + t * p, dim)).astype(np.float32)
    with jax.default_matmul_precision('highest'):
        v = block.init(jax.random.PRNGKey(0), jnp.asarray(x))
        out_jax = block.apply(v, jnp.asarray(x))

    tm = TorchDividedBlock(dim, heads, t).eval()
    p_ = jax.device_get(v['params'])

    def lin(tmod, d):
        tmod.weight.data = torch.from_numpy(
            np.asarray(d['kernel']).T.copy())
        tmod.bias.data = torch.from_numpy(np.asarray(d['bias']).copy())

    def ln(tmod, d):
        tmod.weight.data = torch.from_numpy(
            np.asarray(d['scale']).copy())
        tmod.bias.data = torch.from_numpy(np.asarray(d['bias']).copy())

    ln(tm.norm_t, p_['norm_t'])
    lin(tm.temporal_attn.qkv, p_['temporal_attn']['qkv'])
    lin(tm.temporal_attn.proj, p_['temporal_attn']['proj'])
    lin(tm.temporal_fc, p_['temporal_fc'])
    ln(tm.norm_s, p_['norm_s'])
    lin(tm.spatial_attn.qkv, p_['spatial_attn']['qkv'])
    lin(tm.spatial_attn.proj, p_['spatial_attn']['proj'])
    ln(tm.norm2, p_['norm2'])
    lin(tm.fc1, p_['mlp']['fc1'])
    lin(tm.fc2, p_['mlp']['fc2'])

    with torch.no_grad():
        out_t = tm(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(np.asarray(out_jax), out_t, rtol=1e-4,
                               atol=1e-4)


class TorchTemporalInterlace(tnn.Module):
    """Reference resnet_tin.py TemporalInterlace forward re-implemented
    in torch (tin_shift expressed with the same zero-padded gather
    convention as ours; deform_groups=2 hard-coded like the
    reference)."""

    def __init__(self, c, t, shift_div=4):
        super().__init__()
        self.t, self.shift_div, self.g = t, shift_div, 2
        nf = c // shift_div
        self.off_conv = tnn.Conv1d(nf, 1, 3, padding=1)
        self.off_fc1 = tnn.Linear(t, t)
        self.off_fc2 = tnn.Linear(t, self.g)
        self.w_conv = tnn.Conv1d(nf, self.g, 3, padding=1)

    @staticmethod
    def tin_shift(data, offset):
        n, t, c, s = data.shape
        g = offset.shape[1]
        off_c = offset.repeat_interleave(c // g, dim=1)   # (N, C)
        t_idx = torch.arange(t)[None, :, None]
        src = t_idx - off_c[:, None, :]
        valid = (src >= 0) & (src < t)
        src = src.clamp(0, t - 1).long()
        out = torch.gather(
            data, 1, src[..., None].expand(n, t, c, s))
        return out * valid[..., None]

    def linear_sampler(self, data, offset):
        n, t, c, h, w = data.shape
        o0 = torch.floor(offset).int()
        flat = data.reshape(n, t, c, h * w)
        d0 = self.tin_shift(flat, o0)
        d1 = self.tin_shift(flat, o0 + 1)
        w0 = 1 - (offset - o0.float())
        g = offset.shape[1]
        w0 = w0[:, :, None].repeat(1, 1, c // g).view(n, c)
        w0 = w0[:, None, :, None]
        return (w0 * d0 + (1 - w0) * d1).view(n, t, c, h, w)

    def forward(self, x):                       # (N*T, C, H, W)
        nt, c, h, w = x.shape
        t, n = self.t, nt // self.t
        nf = c // self.shift_div
        xd = x[:, :nf].view(n, t, nf, h, w)
        pooled = xd.mean(dim=(3, 4)).permute(0, 2, 1)     # (N, nf, T)
        off = self.off_conv(pooled).view(n, t)
        off = self.off_fc2(torch.relu(self.off_fc1(off)))
        off = 4 * (torch.sigmoid(off) - 0.5)              # (N, G)
        wgt = 2 * torch.sigmoid(
            self.w_conv(pooled).permute(0, 2, 1))         # (N, T, G)
        off = torch.cat([off, -off], dim=1)               # (N, 2G)
        xs = self.linear_sampler(xd, off)
        wgt = wgt[:, :, :, None].repeat(1, 1, 2, nf // 4)
        wgt = wgt.view(n, t, nf)[:, :, :, None, None]
        xs = (xs * wgt).reshape(nt, nf, h, w)
        return torch.cat([xs, x[:, nf:]], dim=1)


def test_temporal_interlace_matches_torch():
    """Guards the TIN interlace wiring: offset/weight net plumbing, the
    mirrored +/-offset groups, the reference's [g0,g1,g0,g1] gate
    tiling, and the fractional linear sampler."""
    from mscl_tpu.models.backbones.resnet_tin import TemporalInterlace
    rng = np.random.default_rng(8)
    t, c = 4, 16
    mod = TemporalInterlace(num_segments=t, shift_div=4)
    x = rng.normal(size=(2 * t, 5, 5, c)).astype(np.float32)
    with jax.default_matmul_precision('highest'):
        v = mod.init(jax.random.PRNGKey(3), jnp.asarray(x))
        out_jax = mod.apply(v, jnp.asarray(x))

    tm = TorchTemporalInterlace(c, t).eval()
    p = jax.device_get(v['params'])

    def conv1d(tmod, d):
        tmod.weight.data = torch.from_numpy(np.transpose(
            np.asarray(d['kernel']), (2, 1, 0)).copy())
        tmod.bias.data = torch.from_numpy(np.asarray(d['bias']).copy())

    def lin(tmod, d):
        tmod.weight.data = torch.from_numpy(
            np.asarray(d['kernel']).T.copy())
        tmod.bias.data = torch.from_numpy(np.asarray(d['bias']).copy())

    conv1d(tm.off_conv, p['offset_net']['conv'])
    lin(tm.off_fc1, p['offset_net']['fc1'])
    lin(tm.off_fc2, p['offset_net']['fc2'])
    conv1d(tm.w_conv, p['weight_net']['conv'])

    with torch.no_grad():
        xt = torch.from_numpy(x).permute(0, 3, 1, 2)
        out_t = tm(xt).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(out_jax), out_t, rtol=1e-4,
                               atol=1e-4)


class TorchPConv3D(tnn.Module):
    """Reference sepc.py PConv3D (flagship MSCL RGB-tower neck)."""

    def __init__(self, cin, cout, stride=(2, 1, 1), ibn=False):
        super().__init__()
        self.ibn = ibn
        self.convs = tnn.ModuleList([
            tnn.Conv3d(cin, cout, 3, padding=1),
            tnn.Conv3d(cin, cout, 3, padding=1),
            tnn.Conv3d(cin, cout, 3, padding=1, stride=stride),
        ])
        if ibn:
            self.bn = tnn.BatchNorm1d(cout)

    def forward(self, x):
        next_x = []
        for level, feature in enumerate(x):
            temp = self.convs[1](feature)
            if level > 0:
                temp = temp + self.convs[2](x[level - 1])
            if level < len(x) - 1:
                temp = temp + torch.nn.functional.interpolate(
                    self.convs[0](x[level + 1]),
                    size=temp.shape[2:], mode='trilinear')
            next_x.append(temp)
        if self.ibn:
            n, c = next_x[0].shape[:2]
            sizes = [p.shape[2:] for p in next_x]
            flat = torch.cat([p.reshape(n, c, -1) for p in next_x],
                             dim=-1)
            flat = self.bn(flat)
            splits = torch.split(
                flat, [s[0] * s[1] * s[2] for s in sizes], dim=-1)
            next_x = [p.reshape(n, c, *s)
                      for p, s in zip(splits, sizes)]
        return [torch.relu(p) for p in next_x]


@pytest.mark.parametrize('ibn', [False, True])
def test_sepc_pconv_matches_torch(ibn):
    """Flagship-path guard: PConv3D cross-level fusion (strided finer
    tap + trilinear-upsampled coarser tap) and the integrated BN."""
    from mscl_tpu.models.necks.sepc import PConv3D
    rng = np.random.default_rng(9)
    cin = cout = 8
    levels = [(4, 8, 8), (2, 4, 4), (1, 2, 2)]
    xs = [rng.normal(size=(2,) + s + (cin,)).astype(np.float32)
          for s in levels]
    block = PConv3D(cout, (2, 2, 2), iBN=ibn)
    with jax.default_matmul_precision('highest'):
        v = block.init(jax.random.PRNGKey(0),
                       [jnp.asarray(x) for x in xs])
        out_jax = block.apply(v, [jnp.asarray(x) for x in xs],
                              train=False)

    tm = TorchPConv3D(cin, cout, (2, 2, 2), ibn).eval()
    p = jax.device_get(v['params'])
    for j in range(3):
        d = p[f'pconv{j}']
        tm.convs[j].weight.data = torch.from_numpy(np.transpose(
            np.asarray(d['kernel']), (4, 3, 0, 1, 2)).copy())
        tm.convs[j].bias.data = torch.from_numpy(
            np.asarray(d['bias']).copy())
    if ibn:
        s = jax.device_get(v['batch_stats'])
        copy_bn(p['ibn'], s['ibn'], tm.bn)

    with torch.no_grad():
        outs_t = tm([torch.from_numpy(x).permute(0, 4, 1, 2, 3)
                     for x in xs])
    for oj, ot in zip(out_jax, outs_t):
        np.testing.assert_allclose(
            np.asarray(oj), ot.permute(0, 2, 3, 4, 1).numpy(),
            rtol=1e-3, atol=1e-3)


class TorchFPN3D(tnn.Module):
    """mmdet-style 3D FPN (reference necks/fpn.py: lateral 1x1x1 convs,
    nearest top-down sum, (1,3,3) fpn convs)."""

    def __init__(self, cins, cout):
        super().__init__()
        self.lats = tnn.ModuleList(
            [tnn.Conv3d(c, cout, 1) for c in cins])
        self.fpns = tnn.ModuleList(
            [tnn.Conv3d(cout, cout, (1, 3, 3), padding=(0, 1, 1))
             for _ in cins])

    def forward(self, xs):
        lats = [lat(x) for lat, x in zip(self.lats, xs)]
        for i in range(len(lats) - 1, 0, -1):
            lats[i - 1] = lats[i - 1] + torch.nn.functional.interpolate(
                lats[i], size=lats[i - 1].shape[2:], mode='nearest')
        return [f(l) for f, l in zip(self.fpns, lats)]


def test_fpn3d_matches_torch():
    """Flagship-path guard: lateral/topdown/fpn-conv wiring and the
    torch-nearest upsample rule at non-integer scale factors."""
    from mscl_tpu.models.necks.fpn import FPN
    rng = np.random.default_rng(10)
    cins = [8, 12, 16]
    # non-integer scale factors between levels on purpose (5->3->1 T)
    shapes = [(5, 8, 8), (3, 4, 4), (1, 2, 2)]
    xs = [rng.normal(size=(2,) + s + (c,)).astype(np.float32)
          for s, c in zip(shapes, cins)]
    fpn = FPN(in_channels=cins, out_channels=8, num_outs=3)
    with jax.default_matmul_precision('highest'):
        v = fpn.init(jax.random.PRNGKey(0),
                     [jnp.asarray(x) for x in xs])
        out_jax = fpn.apply(v, [jnp.asarray(x) for x in xs])

    tm = TorchFPN3D(cins, 8).eval()
    p = jax.device_get(v['params'])
    for i in range(3):
        for tmod, d in ((tm.lats[i], p[f'lateral_{i}']),
                        (tm.fpns[i], p[f'fpn_{i}'])):
            tmod.weight.data = torch.from_numpy(np.transpose(
                np.asarray(d['kernel']), (4, 3, 0, 1, 2)).copy())
            tmod.bias.data = torch.from_numpy(
                np.asarray(d['bias']).copy())
    with torch.no_grad():
        outs_t = tm([torch.from_numpy(x).permute(0, 4, 1, 2, 3)
                     for x in xs])
    for oj, ot in zip(out_jax, outs_t):
        np.testing.assert_allclose(
            np.asarray(oj), ot.permute(0, 2, 3, 4, 1).numpy(),
            rtol=1e-4, atol=1e-4)


def test_temporal_modulation_matches_torch():
    """Grouped temporal conv + ceil-mode temporal maxpool (reference
    fpn_video.py TemporalModulation)."""
    from mscl_tpu.models.necks.fpn_video import TemporalModulation
    rng = np.random.default_rng(11)
    c = 64
    x = rng.normal(size=(2, 7, 4, 4, c)).astype(np.float32)  # T=7, s=2
    tmod = TemporalModulation(out_channels=c, downsample_scale=2)
    with jax.default_matmul_precision('highest'):
        v = tmod.init(jax.random.PRNGKey(0), jnp.asarray(x))
        out_jax = tmod.apply(v, jnp.asarray(x))

    conv = tnn.Conv3d(c, c, (3, 1, 1), padding=(1, 0, 0), bias=False,
                      groups=32)
    conv.weight.data = torch.from_numpy(np.transpose(
        np.asarray(jax.device_get(v['params']['conv']['kernel'])),
        (4, 3, 0, 1, 2)).copy())
    pool = tnn.MaxPool3d((2, 1, 1), (2, 1, 1), ceil_mode=True)
    with torch.no_grad():
        xt = torch.from_numpy(x).permute(0, 4, 1, 2, 3)
        out_t = pool(conv(xt)).permute(0, 2, 3, 4, 1).numpy()
    np.testing.assert_allclose(np.asarray(out_jax), out_t, rtol=1e-4,
                               atol=1e-4)


def test_s3d_inception_matches_torch():
    """S3D inception block: 4 branches with separable (1,k,k)+(k,1,1)
    convs (BN+ReLU between the halves) and a pooled 1x1x1 branch."""
    from mscl_tpu.models.backbones.s3d import InceptionS3D
    rng = np.random.default_rng(12)
    cin = 12
    cfg = (4, 6, 8, 3, 5, 7)
    block = InceptionS3D(cfg)
    x = rng.normal(size=(2, 4, 8, 8, cin)).astype(np.float32)
    with jax.default_matmul_precision('highest'):
        v = block.init(jax.random.PRNGKey(0), jnp.asarray(x))
        rr = np.random.default_rng(13)
        v = {'params': v['params'],
             'batch_stats': jax.tree.map(
                 lambda a: jnp.asarray(rr.uniform(
                     0.5, 1.5, a.shape).astype(np.float32)),
                 v['batch_stats'])}
        out_jax = block.apply(v, jnp.asarray(x), train=False)

    c1, m3, c3, md3, cd3, cp = cfg

    def convbn(cin_, cout, k, pad):
        return tnn.Sequential(
            tnn.Conv3d(cin_, cout, k, padding=pad, bias=False),
            tnn.BatchNorm3d(cout), tnn.ReLU())

    class TorchInception(tnn.Module):
        def __init__(self):
            super().__init__()
            self.b0 = convbn(cin, c1, 1, 0)
            self.b1r = convbn(cin, m3, 1, 0)
            self.b1s = convbn(m3, c3, (1, 3, 3), (0, 1, 1))
            self.b1t = convbn(c3, c3, (3, 1, 1), (1, 0, 0))
            self.b2r = convbn(cin, md3, 1, 0)
            self.b2s = convbn(md3, cd3, (1, 3, 3), (0, 1, 1))
            self.b2t = convbn(cd3, cd3, (3, 1, 1), (1, 0, 0))
            self.pool = tnn.MaxPool3d(3, 1, 1)
            self.b3 = convbn(cin, cp, 1, 0)

        def forward(self, x):
            return torch.cat([
                self.b0(x),
                self.b1t(self.b1s(self.b1r(x))),
                self.b2t(self.b2s(self.b2r(x))),
                self.b3(self.pool(x))], dim=1)

    tmod = TorchInception().eval()
    p = jax.device_get(v['params'])
    s = jax.device_get(v['batch_stats'])
    pairs = [
        (tmod.b0, 'b0'), (tmod.b1r, 'b1_reduce'), (tmod.b2r,
                                                   'b2_reduce'),
        (tmod.b3, 'b3'),
    ]
    for tm_, name in pairs:
        copy_convbn(p[name], s[name], tm_[0], tm_[1])
    for tm_, name, sub in ((tmod.b1s, 'b1', 'conv_s'),
                           (tmod.b1t, 'b1', 'conv_t'),
                           (tmod.b2s, 'b2', 'conv_s'),
                           (tmod.b2t, 'b2', 'conv_t')):
        copy_convbn(p[name][sub], s[name][sub], tm_[0], tm_[1])
    with torch.no_grad():
        xt = torch.from_numpy(x).permute(0, 4, 1, 2, 3)
        out_t = tmod(xt).permute(0, 2, 3, 4, 1).numpy()
    np.testing.assert_allclose(np.asarray(out_jax), out_t, rtol=1e-3,
                               atol=1e-3)


def test_slowfast_lateral_wiring():
    """Reference resnet3d_slowfast.py:507-521: four lateral fusion
    points (stem + layers 1-3), each a (5,1,1)/stride-alpha bias-free
    conv doubling its input channels, concatenated into the slow path."""
    from mscl_tpu.models.builder import build_backbone
    m = build_backbone(dict(
        type='ResNet3dSlowFast', resample_rate=4, speed_ratio=4,
        channel_ratio=8,
        slow_pathway=dict(depth=50, lateral=True,
                          conv1_kernel=(1, 7, 7),
                          inflate=(0, 0, 1, 1)),
        fast_pathway=dict(depth=50, lateral=False, base_channels=8,
                          conv1_kernel=(5, 7, 7), conv1_stride_t=1,
                          pool1_stride_t=1)))
    x = jnp.zeros((1, 16, 32, 32, 3))
    v = m.init(jax.random.PRNGKey(0), x)
    p = v['params']
    # four laterals with 2x-input output widths: stem 8->16,
    # layer1 32->64, layer2 64->128, layer3 128->256
    for i, (cin, cout) in enumerate([(8, 16), (32, 64), (64, 128),
                                     (128, 256)]):
        k = p[f'lateral_{i}']['kernel']
        assert k.shape == (5, 1, 1, cin, cout), (i, k.shape)
    # slow layer1 input = 64 (stem) + 16 (lateral) channels
    k1 = p['slow_path']['layer1_0']['conv1']['conv']['kernel']
    assert k1.shape[-2] == 80, k1.shape
    slow, fast = m.apply(v, x, mutable=['batch_stats'])[0]
    assert slow.shape[1] * 4 == fast.shape[1]     # speed ratio


@pytest.mark.parametrize('inflate,style', [
    (True, '3x1x1'), (True, '3x3x3'), (False, '3x1x1')])
def test_bottleneck3d_matches_torch(inflate, style):
    """SlowOnly/mscl_r50/AVA path guard: Bottleneck3d kernel/padding/
    stride placement per inflate style ('pytorch' mode: stride on
    conv2) — reference resnet3d.py:228-280."""
    from mscl_tpu.models.backbones.resnet3d import Bottleneck3d
    rng = np.random.default_rng(14)
    planes, cin = 4, 8
    block = Bottleneck3d(planes, spatial_stride=2, temporal_stride=2,
                         inflate=inflate, inflate_style=style,
                         downsample=True)
    x = rng.normal(size=(2, 4, 8, 8, cin)).astype(np.float32)
    with jax.default_matmul_precision('highest'):
        v = block.init(jax.random.PRNGKey(0), jnp.asarray(x))
        out_jax = block.apply(v, jnp.asarray(x), train=False)

    if inflate and style == '3x1x1':
        k1, p1, k2, p2 = (3, 1, 1), (1, 0, 0), (1, 3, 3), (0, 1, 1)
    elif inflate:
        k1, p1, k2, p2 = (1, 1, 1), (0, 0, 0), (3, 3, 3), (1, 1, 1)
    else:
        k1, p1, k2, p2 = (1, 1, 1), (0, 0, 0), (1, 3, 3), (0, 1, 1)

    class TorchBottleneck(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = tnn.Sequential(
                tnn.Conv3d(cin, planes, k1, padding=p1, bias=False),
                tnn.BatchNorm3d(planes), tnn.ReLU())
            self.conv2 = tnn.Sequential(
                tnn.Conv3d(planes, planes, k2, stride=(2, 2, 2),
                           padding=p2, bias=False),
                tnn.BatchNorm3d(planes), tnn.ReLU())
            self.conv3 = tnn.Sequential(
                tnn.Conv3d(planes, planes * 4, 1, bias=False),
                tnn.BatchNorm3d(planes * 4))
            self.downsample = tnn.Sequential(
                tnn.Conv3d(cin, planes * 4, 1, stride=(2, 2, 2),
                           bias=False),
                tnn.BatchNorm3d(planes * 4))

        def forward(self, x):
            out = self.conv3(self.conv2(self.conv1(x)))
            return torch.relu(out + self.downsample(x))

    tm = TorchBottleneck().eval()
    p = jax.device_get(v['params'])
    s = jax.device_get(v['batch_stats'])
    copy_convbn(p['conv1'], s['conv1'], tm.conv1[0], tm.conv1[1])
    tm.conv2[0].weight.data = torch.from_numpy(np.transpose(
        np.asarray(p['conv2_conv']['kernel']), (4, 3, 0, 1, 2)).copy())
    copy_bn(p['conv2_bn'], s['conv2_bn'], tm.conv2[1])
    copy_convbn(p['conv3'], s['conv3'], tm.conv3[0], tm.conv3[1])
    copy_convbn(p['downsample'], s['downsample'], tm.downsample[0],
                tm.downsample[1])
    with torch.no_grad():
        xt = torch.from_numpy(x).permute(0, 4, 1, 2, 3)
        out_t = tm(xt).permute(0, 2, 3, 4, 1).numpy()
    np.testing.assert_allclose(np.asarray(out_jax), out_t, rtol=1e-3,
                               atol=1e-3)


def test_mobilenetv2_inverted_residual_matches_torch():
    """Inverted residual: expand 1x1 -> depthwise 3x3 -> project 1x1
    with ReLU6 and the stride-1/same-channels residual rule."""
    from mscl_tpu.models.backbones.mobilenet_v2 import InvertedResidual
    rng = np.random.default_rng(15)
    cin = cout = 8
    block = InvertedResidual(cout, stride=1, expand_ratio=6)
    x = rng.normal(size=(2, 8, 8, cin)).astype(np.float32)
    with jax.default_matmul_precision('highest'):
        v = block.init(jax.random.PRNGKey(0), jnp.asarray(x))
        out_jax = block.apply(v, jnp.asarray(x), train=False)

    hidden = cin * 6

    class TorchIR(tnn.Module):
        def __init__(self):
            super().__init__()
            self.expand = tnn.Sequential(
                tnn.Conv2d(cin, hidden, 1, bias=False),
                tnn.BatchNorm2d(hidden), tnn.ReLU6())
            self.dw = tnn.Sequential(
                tnn.Conv2d(hidden, hidden, 3, padding=1, groups=hidden,
                           bias=False),
                tnn.BatchNorm2d(hidden), tnn.ReLU6())
            self.proj = tnn.Sequential(
                tnn.Conv2d(hidden, cout, 1, bias=False),
                tnn.BatchNorm2d(cout))

        def forward(self, x):
            return x + self.proj(self.dw(self.expand(x)))

    tm = TorchIR().eval()
    p = jax.device_get(v['params'])
    s = jax.device_get(v['batch_stats'])

    def copy2d(cname, tconv, tbn, pkey, bnkey=None):
        d = p[pkey]
        kern = d['conv']['kernel'] if 'conv' in d else d['kernel']
        tconv.weight.data = torch.from_numpy(np.transpose(
            np.asarray(kern), (3, 2, 0, 1)).copy())
        bnp = d['bn'] if 'bn' in d else p[bnkey]
        bns = s[pkey]['bn'] if 'conv' in d else s[bnkey]
        copy_bn(bnp, bns, tbn)

    copy2d('expand', tm.expand[0], tm.expand[1], 'expand')
    copy2d('depthwise', tm.dw[0], tm.dw[1], 'depthwise')
    copy2d('project', tm.proj[0], tm.proj[1], 'project', 'project_bn')
    with torch.no_grad():
        xt = torch.from_numpy(x).permute(0, 3, 1, 2)
        out_t = tm(xt).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(out_jax), out_t, rtol=1e-3,
                               atol=1e-3)


@pytest.mark.parametrize('op', ['concat', 'sum'])
def test_conv_audio_matches_torch(op):
    """Factorized (k,1)+(1,k) audio conv pair, per-branch BN+ReLU
    (reference common/conv_audio.py)."""
    from mscl_tpu.models.backbones.resnet_audio import ConvAudio
    rng = np.random.default_rng(16)
    cin, cout = 6, 8
    block = ConvAudio(cout, 3, stride=2, op=op)
    x = rng.normal(size=(2, 9, 9, cin)).astype(np.float32)
    with jax.default_matmul_precision('highest'):
        v = block.init(jax.random.PRNGKey(0), jnp.asarray(x))
        out_jax = block.apply(v, jnp.asarray(x), train=False)

    class TorchConvAudio(tnn.Module):
        def __init__(self):
            super().__init__()
            self.c1 = tnn.Sequential(
                tnn.Conv2d(cin, cout, (3, 1), stride=2,
                           padding=(1, 0), bias=False),
                tnn.BatchNorm2d(cout), tnn.ReLU())
            self.c2 = tnn.Sequential(
                tnn.Conv2d(cin, cout, (1, 3), stride=2,
                           padding=(0, 1), bias=False),
                tnn.BatchNorm2d(cout), tnn.ReLU())

        def forward(self, x):
            a, b = self.c1(x), self.c2(x)
            return torch.cat([a, b], 1) if op == 'concat' else a + b

    tm = TorchConvAudio().eval()
    p = jax.device_get(v['params'])
    s = jax.device_get(v['batch_stats'])
    for tmod, name in ((tm.c1, 'conv_1'), (tm.c2, 'conv_2')):
        tmod[0].weight.data = torch.from_numpy(np.transpose(
            np.asarray(p[f'{name}_conv']['kernel']),
            (3, 2, 0, 1)).copy())
        copy_bn(p[f'{name}_bn'], s[f'{name}_bn'], tmod[1])
    with torch.no_grad():
        xt = torch.from_numpy(x).permute(0, 3, 1, 2)
        out_t = tm(xt).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(out_jax), out_t, rtol=1e-4,
                               atol=1e-4)


# --------------------------------------------------------------- NonLocal3d
class TorchNonLocal3d(tnn.Module):
    """Independent torch embedded-gaussian non-local block (mmcv
    NonLocal3d semantics: optional (1,2,2) sub-sample on phi/g, 1/sqrt(ic)
    scaling, conv_out + BN residual)."""

    def __init__(self, c, reduction=2, sub_sample=True, use_scale=True):
        super().__init__()
        ic = c // reduction
        self.ic, self.sub_sample, self.use_scale = ic, sub_sample, use_scale
        self.theta = tnn.Conv3d(c, ic, 1)
        self.phi = tnn.Conv3d(c, ic, 1)
        self.g = tnn.Conv3d(c, ic, 1)
        self.conv_out = tnn.Conv3d(ic, c, 1)
        self.bn = tnn.BatchNorm3d(c)
        self.pool = tnn.MaxPool3d((1, 2, 2))

    def forward(self, x):                        # (N, C, T, H, W)
        n, c, t, h, w = x.shape
        q = self.theta(x).flatten(2).transpose(1, 2)       # (n, thw, ic)
        kv = self.pool(x) if self.sub_sample else x
        k = self.phi(kv).flatten(2)                        # (n, ic, m)
        v = self.g(kv).flatten(2).transpose(1, 2)          # (n, m, ic)
        attn = q @ k
        if self.use_scale:
            attn = attn / self.ic ** 0.5
        y = attn.softmax(dim=-1) @ v                       # (n, thw, ic)
        y = y.transpose(1, 2).reshape(n, self.ic, t, h, w)
        return x + self.bn(self.conv_out(y))


@pytest.mark.parametrize('sub_sample,use_scale', [(True, True),
                                                  (False, False)])
def test_nonlocal3d_matches_torch(sub_sample, use_scale):
    from mscl_tpu.models.backbones.resnet3d import NonLocal3d
    c = 16
    mod = NonLocal3d(c, sub_sample=sub_sample, use_scale=use_scale)
    x = np.random.default_rng(0).normal(size=(2, 4, 8, 8, c)).astype(
        np.float32)
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    # randomize everything incl. the zero-init BN gamma
    rng = np.random.default_rng(1)
    params = jax.tree.map(
        lambda v: jnp.asarray(rng.normal(size=v.shape) * 0.2,
                              jnp.float32), variables['params'])
    stats = jax.tree.map(
        lambda v: jnp.asarray(np.abs(rng.normal(size=v.shape)) * 0.5 +
                              0.5, jnp.float32),
        variables['batch_stats'])
    out = mod.apply({'params': params, 'batch_stats': stats},
                    jnp.asarray(x), train=False)

    tmod = TorchNonLocal3d(c, sub_sample=sub_sample, use_scale=use_scale)
    for name, conv in (('theta', tmod.theta), ('phi', tmod.phi),
                       ('g', tmod.g), ('conv_out', tmod.conv_out)):
        conv.weight.data = torch.from_numpy(np.transpose(
            np.asarray(params[name]['kernel']), (4, 3, 0, 1, 2)).copy())
        conv.bias.data = torch.from_numpy(
            np.asarray(params[name]['bias']).copy())
    tmod.bn.weight.data = torch.from_numpy(
        np.asarray(params['bn_out']['scale']).copy())
    tmod.bn.bias.data = torch.from_numpy(
        np.asarray(params['bn_out']['bias']).copy())
    tmod.bn.running_mean.data = torch.from_numpy(
        np.asarray(stats['bn_out']['mean']).copy())
    tmod.bn.running_var.data = torch.from_numpy(
        np.asarray(stats['bn_out']['var']).copy())
    tmod.eval()
    with torch.no_grad():
        tout = tmod(torch.from_numpy(
            np.transpose(x, (0, 4, 1, 2, 3)).copy()))
    np.testing.assert_allclose(
        np.transpose(np.asarray(out), (0, 4, 1, 2, 3)),
        tout.numpy(), rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize('impl', ['flax', 'lp', 'split'])
def test_convbn_train_mode_matches_torch(impl, monkeypatch):
    """Train-mode (batch-statistics) ConvBN block math vs torch under
    every BN implementation — output AND input gradient. Pins the
    lp/split custom-VJP backward to torch's analytic BN backward
    (CLAUDE.md: extend this campaign when touching block math)."""
    from mscl_tpu.models.backbones.video_resnet import ConvBN
    monkeypatch.setenv('MSCL_BN_IMPL', impl)
    rng = np.random.default_rng(3)
    x = rng.normal(size=(2, 4, 8, 8, 3)).astype(np.float32) * 2 + 0.5
    w = rng.normal(size=(2, 4, 8, 8, 8)).astype(np.float32)
    blk = ConvBN(8, (3, 3, 3))
    with jax.default_matmul_precision('highest'):
        variables = blk.init({'params': jax.random.PRNGKey(1)},
                             jnp.asarray(x), train=True)
        # non-trivial scale/bias
        p = jax.device_get(variables['params'])
        p['bn']['scale'] = rng.uniform(
            0.5, 1.5, p['bn']['scale'].shape).astype(np.float32)
        p['bn']['bias'] = rng.normal(
            size=p['bn']['bias'].shape).astype(np.float32)
        variables = {'params': jax.tree.map(jnp.asarray, p),
                     'batch_stats': variables['batch_stats']}

        def f(inp):
            y, _ = blk.apply(variables, inp, train=True,
                             mutable=['batch_stats'])
            return (y * jnp.asarray(w)).sum(), y

        with jax.checking_leaks():
            (loss, y_jax), gx_jax = jax.value_and_grad(
                f, has_aux=True)(jnp.asarray(x))

    tconv = tnn.Conv3d(3, 8, 3, padding=1, bias=False)
    tbn = tnn.BatchNorm3d(8, eps=1e-5)
    copy_convbn(jax.device_get(variables['params']),
                jax.device_get(variables['batch_stats']), tconv, tbn)
    tconv.train(), tbn.train()
    xt = torch.from_numpy(
        np.transpose(x, (0, 4, 1, 2, 3)).copy()).requires_grad_(True)
    yt = torch.relu(tbn(tconv(xt)))
    (yt * torch.from_numpy(
        np.transpose(w, (0, 4, 1, 2, 3)).copy())).sum().backward()

    np.testing.assert_allclose(
        np.asarray(y_jax), yt.detach().numpy().transpose(0, 2, 3, 4, 1),
        rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(gx_jax), xt.grad.numpy().transpose(0, 2, 3, 4, 1),
        rtol=1e-3, atol=1e-3)
