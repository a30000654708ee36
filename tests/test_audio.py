"""Audio stack: ResNetAudio/ConvAudio, TIN backbone, audio datasets and
pipeline transforms, AudioRecognizer end to end."""
import os.path as osp
import wave

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mscl_tpu.datasets import (AudioDataset, AudioFeatureDataset,
                               default_collate)
from mscl_tpu.models import BACKBONES, RECOGNIZERS


class TestTIN:

    def test_tin_shift_semantics(self):
        from mscl_tpu.models.backbones import tin_shift
        # 1 sample, T=4, C=2 (2 groups of 1), S=1
        data = jnp.arange(1, 9, dtype=jnp.float32).reshape(1, 4, 2, 1)
        # group 0 shift +1 (delay), group 1 shift -1 (advance)
        off = jnp.asarray([[1, -1]], jnp.int32)
        out = np.asarray(tin_shift(data, off))[..., 0]
        # channel 0: out[t] = data[t-1], zero at t=0
        np.testing.assert_array_equal(out[0, :, 0], [0, 1, 3, 5])
        # channel 1: out[t] = data[t+1], zero at t=3
        np.testing.assert_array_equal(out[0, :, 1], [4, 6, 8, 0])

    def test_linear_sampler_blends(self):
        from mscl_tpu.models.backbones import linear_sampler
        data = jnp.arange(4, dtype=jnp.float32).reshape(1, 4, 1, 1, 1)
        out_int = np.asarray(
            linear_sampler(data, jnp.asarray([[1.0]])))[0, :, 0, 0, 0]
        np.testing.assert_allclose(out_int, [0, 0, 1, 2], atol=1e-6)
        out_half = np.asarray(
            linear_sampler(data, jnp.asarray([[0.5]])))[0, :, 0, 0, 0]
        # halfway between shift-0 and shift-1
        np.testing.assert_allclose(out_half, [0, 0.5, 1.5, 2.5],
                                   atol=1e-6)

    def test_backbone_forward(self):
        bb = BACKBONES.get('ResNetTIN')(depth=18, num_segments=4)
        x = jnp.zeros((8, 32, 32, 3))
        v = bb.init(jax.random.PRNGKey(0), x)
        out, _ = bb.apply(v, x, train=True, mutable=['batch_stats'])
        assert out.shape == (8, 1, 1, 512)


class TestResNetAudio:

    def test_feat_dim_and_nchw_input(self):
        bb = BACKBONES.get('ResNetAudio')(depth=50)
        # reference feat_dim = base_channels * 2**3 * expansion = 1024
        x = jnp.zeros((2, 1, 64, 40))  # NCHW spectrogram accepted
        v = bb.init(jax.random.PRNGKey(0), x)
        out = bb.apply(v, x)
        assert out.shape[-1] == 1024


@pytest.fixture(scope='module')
def audio_root(tmp_path_factory):
    root = tmp_path_factory.mktemp('audio')
    rng = np.random.default_rng(0)
    lines_wav, lines_npy = [], []
    for v in range(8):
        wav_path = root / f'clip_{v}.wav'
        y = (rng.normal(size=16000) * 3000).astype(np.int16)
        with wave.open(str(wav_path), 'wb') as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(16000)
            w.writeframes(y.tobytes())
        np.save(root / f'feat_{v}.npy',
                rng.random((200, 80)).astype(np.float32))
        lines_wav.append(f'clip_{v}.wav 100 {v % 2}')
        lines_npy.append(f'feat_{v}.npy 100 {v % 2}')
    (root / 'wav.txt').write_text('\n'.join(lines_wav))
    (root / 'npy.txt').write_text('\n'.join(lines_npy))
    return str(root)


class TestAudioPipeline:

    def test_feature_path_e2e(self, audio_root):
        pipeline = [
            dict(type='SampleFrames', clip_len=32, frame_interval=2,
                 num_clips=1),
            dict(type='LoadAudioFeature'),
            dict(type='AudioFeatureSelector', fixed_length=64),
            dict(type='FormatAudioShape', input_format='NCTF'),
            dict(type='Collect', keys=['audios', 'label'], meta_keys=[]),
            dict(type='ToTensor', keys=['audios', 'label']),
        ]
        ds = AudioFeatureDataset(osp.join(audio_root, 'npy.txt'),
                                 pipeline, data_prefix=audio_root)
        sample = ds[0]
        assert sample['audios'].shape == (1, 1, 64, 80)

        batch = default_collate([ds[i] for i in range(2)])
        model = RECOGNIZERS.get('AudioRecognizer')(
            backbone=dict(type='ResNetAudio', depth=50),
            cls_head=dict(type='AudioTSNHead', num_classes=2,
                          in_channels=1024, dropout_ratio=0.0),
            test_cfg=dict(average_clips='prob'))
        rng = jax.random.PRNGKey(0)
        variables = model.init({'params': rng, 'dropout': rng},
                               batch, method='train_step')
        (loss, log_vars), _ = model.apply(
            variables, batch, method='train_step',
            mutable=['batch_stats'],
            rngs={'dropout': jax.random.PRNGKey(1)})
        assert np.isfinite(float(loss))
        assert 'top1_acc' in log_vars
        scores = model.apply(variables, jnp.asarray(batch['audios']),
                             return_loss=False)
        assert scores.shape == (2, 2)
        np.testing.assert_allclose(np.asarray(scores).sum(-1), 1.0,
                                   atol=1e-5)

    def test_waveform_path(self, audio_root):
        pipeline = [
            dict(type='AudioDecodeInit', sample_rate=16000),
            dict(type='SampleFrames', clip_len=16, frame_interval=2,
                 num_clips=2),
            dict(type='AudioDecode', fixed_length=8000),
            dict(type='AudioAmplify', ratio=1.5),
            dict(type='MelSpectrogram', n_mels=40, fixed_length=32),
            dict(type='FormatAudioShape', input_format='NCTF'),
            dict(type='Collect', keys=['audios', 'label'], meta_keys=[]),
            dict(type='ToTensor', keys=['audios', 'label']),
        ]
        ds = AudioDataset(osp.join(audio_root, 'wav.txt'), pipeline,
                          data_prefix=audio_root)
        sample = ds[0]
        assert sample['audios'].shape == (2, 1, 32, 40)
        assert np.isfinite(np.asarray(sample['audios'])).all()

    def test_missing_audio_pads(self, audio_root):
        t = __import__('mscl_tpu.datasets.audio_dataset',
                       fromlist=['LoadAudioFeature']).LoadAudioFeature()
        out = t(dict(audio_path='/nonexistent.npy'))
        assert out['audios'].shape == (640, 80)
        assert out['length'] == 640
