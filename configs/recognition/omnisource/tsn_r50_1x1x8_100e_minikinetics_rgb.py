# OmniSource TSN (parity: reference configs/recognition/omnisource/
# tsn_r50_1x1x8_100e_minikinetics/*.py): a labeled rawframe source
# plus auxiliary web-image/video sources consumed by OmniSourceRunner
# (core/train_loop.py) with per-source loss suffixes.
_base_ = ['../../_base_/default_runtime.py']

model = dict(
    type='Recognizer2D',
    backbone=dict(type='ResNet', depth=50),
    cls_head=dict(type='TSNHead', num_classes=200, in_channels=2048,
                  spatial_type='avg',
                  consensus=dict(type='AvgConsensus', dim=1),
                  dropout_ratio=0.4, init_std=0.01),
    test_cfg=dict(average_clips='prob'))
img_norm_cfg = dict(mean=[123.675, 116.28, 103.53],
                    std=[58.395, 57.12, 57.375], to_bgr=False)
train_pipeline = [
    dict(type='SampleFrames', clip_len=1, frame_interval=1, num_clips=8),
    dict(type='RawFrameDecode'),
    dict(type='Resize', scale=(-1, 256)),
    dict(type='RandomResizedCrop'),
    dict(type='Resize', scale=(224, 224), keep_ratio=False),
    dict(type='Flip', flip_ratio=0.5),
    dict(type='Normalize', **img_norm_cfg),
    dict(type='FormatShape', input_format='NCHW'),
    dict(type='Collect', keys=['imgs', 'label'], meta_keys=[]),
    dict(type='ToTensor', keys=['imgs', 'label']),
]
# web images arrive as single frames built into pseudo clips
image_pipeline = [
    dict(type='ImageDecode'),
    dict(type='BuildPseudoClip', clip_len=1),
    dict(type='Resize', scale=(-1, 256)),
    dict(type='RandomResizedCrop'),
    dict(type='Resize', scale=(224, 224), keep_ratio=False),
    dict(type='Flip', flip_ratio=0.5),
    dict(type='Normalize', **img_norm_cfg),
    dict(type='FormatShape', input_format='NCHW'),
    dict(type='Collect', keys=['imgs', 'label'], meta_keys=[]),
    dict(type='ToTensor', keys=['imgs', 'label']),
]
val_pipeline = [
    dict(type='SampleFrames', clip_len=1, frame_interval=1, num_clips=8,
         test_mode=True),
    dict(type='RawFrameDecode'),
    dict(type='Resize', scale=(-1, 256)),
    dict(type='CenterCrop', crop_size=224),
    dict(type='Normalize', **img_norm_cfg),
    dict(type='FormatShape', input_format='NCHW'),
    dict(type='Collect', keys=['imgs', 'label'], meta_keys=[]),
    dict(type='ToTensor', keys=['imgs', 'label']),
]
data = dict(
    videos_per_gpu=12, workers_per_gpu=4, omni_videos_per_gpu=[12, 64],
    train=[
        dict(type='RawframeDataset',
             ann_file='data/kinetics400/'
                      'kinetics200_train_list_rawframes.txt',
             data_prefix='data/kinetics400/rawframes_train',
             pipeline=train_pipeline),
        dict(type='ImageDataset',
             ann_file='data/OmniSource/'
                      'googleimage_200_googleimage.txt',
             data_prefix='data/OmniSource',
             pipeline=image_pipeline),
    ],
    train_ratio=[2, 1],
    val=dict(type='RawframeDataset',
             ann_file='data/kinetics400/'
                      'kinetics200_val_list_rawframes.txt',
             data_prefix='data/kinetics400/rawframes_val',
             pipeline=val_pipeline),
    test=dict(type='RawframeDataset',
              ann_file='data/kinetics400/'
                       'kinetics200_val_list_rawframes.txt',
              data_prefix='data/kinetics400/rawframes_val',
              pipeline=val_pipeline))
evaluation = dict(interval=5,
                  metrics=['top_k_accuracy', 'mean_class_accuracy'])
optimizer = dict(type='SGD', lr=0.00375, momentum=0.9,
                 weight_decay=1e-4)
optimizer_config = dict(grad_clip=dict(max_norm=40, norm_type=2))
lr_config = dict(policy='CosineAnnealing', min_lr=0)
total_epochs = 100
checkpoint_config = dict(interval=5)
log_config = dict(interval=20, hooks=[dict(type='TextLoggerHook')])
work_dir = './work_dirs/tsn_r50_1x1x8_100e_minikinetics_rgb'
