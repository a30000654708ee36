# parity: reference configs/recognition/slowonly/
# slowonly_imagenet_pretrained_r50_8x4x1_64e_kinetics400_rgb.py
# (2D-imagenet inflated init; shorter 64e schedule).
_base_ = ['slowonly_r50_8x8x1_256e_kinetics400_rgb.py']
model = dict(backbone=dict(pretrained2d=True,
                           pretrained='torchvision://resnet50'))
img_norm_cfg = dict(mean=[123.675, 116.28, 103.53],
                    std=[58.395, 57.12, 57.375], to_bgr=False)
train_pipeline = [
    dict(type='SampleFrames', clip_len=8, frame_interval=4,
         num_clips=1),
    dict(type='RawFrameDecode'),
    dict(type='Resize', scale=(-1, 256)),
    dict(type='RandomResizedCrop'),
    dict(type='Resize', scale=(224, 224), keep_ratio=False),
    dict(type='Flip', flip_ratio=0.5),
    dict(type='Normalize', **img_norm_cfg),
    dict(type='FormatShape', input_format='NCTHW'),
    dict(type='Collect', keys=['imgs', 'label'], meta_keys=[]),
    dict(type='ToTensor', keys=['imgs', 'label']),
]
data = dict(train=dict(pipeline=train_pipeline))
lr_config = dict(_delete_=True, policy='CosineAnnealing', min_lr=0)
total_epochs = 64
work_dir = ('./work_dirs/slowonly_imagenet_pretrained_r50_8x4x1_64e_'
            'kinetics400_rgb')
