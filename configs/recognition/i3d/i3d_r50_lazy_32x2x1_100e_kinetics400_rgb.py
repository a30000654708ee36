# parity: reference configs/recognition/i3d/
# i3d_r50_lazy_32x2x1_100e_kinetics400_rgb.py (lazy geometric ops fused
# into ONE warp by Fuse — pipelines/augmentations.py lazy path).
_base_ = ['i3d_r50_32x2x1_100e_kinetics400_rgb.py']
img_norm_cfg = dict(mean=[123.675, 116.28, 103.53],
                    std=[58.395, 57.12, 57.375], to_bgr=False)
train_pipeline = [
    dict(type='SampleFrames', clip_len=32, frame_interval=2,
         num_clips=1),
    dict(type='RawFrameDecode'),
    dict(type='Resize', scale=(-1, 256), lazy=True),
    dict(type='RandomResizedCrop', lazy=True),
    dict(type='Resize', scale=(224, 224), keep_ratio=False, lazy=True),
    dict(type='Flip', flip_ratio=0.5, lazy=True),
    dict(type='Fuse'),
    dict(type='Normalize', **img_norm_cfg),
    dict(type='FormatShape', input_format='NCTHW'),
    dict(type='Collect', keys=['imgs', 'label'], meta_keys=[]),
    dict(type='ToTensor', keys=['imgs', 'label']),
]
data = dict(train=dict(pipeline=train_pipeline))
work_dir = './work_dirs/i3d_r50_lazy_32x2x1_100e_kinetics400_rgb'
