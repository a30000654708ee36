# parity: reference configs/recognition_audio/resnet/
# tsn_r50_64x1x1_100e_kinetics400_audio.py — RAW audio path: wav decode
# + on-the-fly log-mel spectrogram into a 2D ResNet-50 (the reference's
# raw-audio model is plain ResNet on 1-channel spectrograms; its
# MelLogSpectrogram pipeline name is a reference registration gap we
# fill with the log-mel transform).
_base_ = ['../../_base_/default_runtime.py']
model = dict(
    type='AudioRecognizer',
    backbone=dict(type='ResNet', depth=50, pretrained=None,
                  in_channels=1, norm_eval=False),
    cls_head=dict(type='AudioTSNHead', num_classes=400,
                  in_channels=2048, dropout_ratio=0.5, init_std=0.01),
    test_cfg=dict(average_clips='prob'))
dataset_type = 'AudioDataset'
data_root = 'data/kinetics400/audios'
ann_file_train = 'data/kinetics400/kinetics400_train_list_audio.txt'
train_pipeline = [
    dict(type='AudioDecodeInit'),
    dict(type='SampleFrames', clip_len=64, frame_interval=1,
         num_clips=1),
    dict(type='AudioDecode'),
    dict(type='AudioAmplify', ratio=1.5),
    dict(type='MelLogSpectrogram'),
    dict(type='FormatAudioShape', input_format='NCTF'),
    dict(type='Collect', keys=['audios', 'label'], meta_keys=[]),
    dict(type='ToTensor', keys=['audios', 'label']),
]
data = dict(
    videos_per_gpu=32, workers_per_gpu=2,
    train=dict(type=dataset_type, ann_file=ann_file_train,
               data_prefix=data_root, pipeline=train_pipeline))
optimizer = dict(type='SGD', lr=0.1, momentum=0.9, weight_decay=1e-4)
optimizer_config = dict(grad_clip=dict(max_norm=40, norm_type=2))
lr_config = dict(policy='CosineAnnealing', min_lr=0)
total_epochs = 100
checkpoint_config = dict(interval=5)
log_config = dict(interval=20, hooks=[dict(type='TextLoggerHook')])
work_dir = './work_dirs/tsn_r50_64x1x1_100e_kinetics400_audio'
