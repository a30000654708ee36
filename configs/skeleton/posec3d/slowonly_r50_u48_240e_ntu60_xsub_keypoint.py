# PoseC3D SlowOnly over joint pseudo-heatmaps (parity: reference-family
# mmaction2 configs/skeleton/posec3d/
# slowonly_r50_u48_240e_ntu60_xsub_keypoint.py).
_base_ = ['../../_base_/default_runtime.py']

model = dict(
    type='Recognizer3D',
    backbone=dict(type='ResNet3dSlowOnly', depth=50, pretrained=None,
                  in_channels=17, base_channels=32, num_stages=3,
                  out_indices=(2,), stage_blocks=(4, 6, 3),
                  conv1_kernel=(1, 7, 7), conv1_stride_t=1,
                  pool1_stride_t=1, with_pool1=False,
                  inflate=(0, 1, 1), spatial_strides=(2, 2, 2),
                  temporal_strides=(1, 1, 2), dilations=(1, 1, 1)),
    cls_head=dict(type='I3DHead', num_classes=60, in_channels=512,
                  spatial_type='avg', dropout_ratio=0.5),
    test_cfg=dict(average_clips='prob'))

dataset_type = 'PoseDataset'
ann_file_train = 'data/posec3d/ntu60_xsub_train.pkl'
ann_file_val = 'data/posec3d/ntu60_xsub_val.pkl'
train_pipeline = [
    dict(type='UniformSampleFrames', clip_len=48),
    dict(type='PoseDecode'),
    dict(type='GeneratePoseTarget', sigma=0.6, use_score=True,
         with_kp=True, with_limb=False),
    dict(type='FormatShape', input_format='NCTHW_Heatmap'),
    dict(type='Collect', keys=['imgs', 'label'], meta_keys=[]),
    dict(type='ToTensor', keys=['imgs', 'label']),
]
val_pipeline = [
    dict(type='UniformSampleFrames', clip_len=48, num_clips=1,
         test_mode=True),
    dict(type='PoseDecode'),
    dict(type='GeneratePoseTarget', sigma=0.6, use_score=True,
         with_kp=True, with_limb=False),
    dict(type='FormatShape', input_format='NCTHW_Heatmap'),
    dict(type='Collect', keys=['imgs', 'label'], meta_keys=[]),
    dict(type='ToTensor', keys=['imgs', 'label']),
]
test_pipeline = [
    dict(type='UniformSampleFrames', clip_len=48, num_clips=10,
         test_mode=True),
    dict(type='PoseDecode'),
    dict(type='GeneratePoseTarget', sigma=0.6, use_score=True,
         with_kp=True, with_limb=False, double=True),
    dict(type='FormatShape', input_format='NCTHW_Heatmap'),
    dict(type='Collect', keys=['imgs', 'label'], meta_keys=[]),
    dict(type='ToTensor', keys=['imgs', 'label']),
]
data = dict(
    videos_per_gpu=16, workers_per_gpu=2,
    train=dict(type=dataset_type, ann_file=ann_file_train,
               pipeline=train_pipeline),
    val=dict(type=dataset_type, ann_file=ann_file_val,
             pipeline=val_pipeline),
    test=dict(type=dataset_type, ann_file=ann_file_val,
              pipeline=test_pipeline))
evaluation = dict(interval=10,
                  metrics=['top_k_accuracy', 'mean_class_accuracy'])
optimizer = dict(type='SGD', lr=0.2, momentum=0.9, weight_decay=3e-4)
optimizer_config = dict(grad_clip=dict(max_norm=40, norm_type=2))
lr_config = dict(policy='CosineAnnealing', min_lr=0)
total_epochs = 240
checkpoint_config = dict(interval=10)
log_config = dict(interval=20, hooks=[dict(type='TextLoggerHook')])
work_dir = './work_dirs/posec3d/slowonly_r50_u48_240e_ntu60_xsub'
