# parity: reference configs/recognition/i3d/
# i3d_r50_video_32x2x1_100e_kinetics400_rgb.py (VideoDataset + decord).
_base_ = ['i3d_r50_32x2x1_100e_kinetics400_rgb.py']
dataset_type = 'VideoDataset'
data_root = 'data/kinetics400/videos_train'
ann_file_train = 'data/kinetics400/kinetics400_train_list_videos.txt'
img_norm_cfg = dict(mean=[123.675, 116.28, 103.53],
                    std=[58.395, 57.12, 57.375], to_bgr=False)
train_pipeline = [
    dict(type='DecordInit'),
    dict(type='SampleFrames', clip_len=32, frame_interval=2,
         num_clips=1),
    dict(type='DecordDecode'),
    dict(type='Resize', scale=(-1, 256)),
    dict(type='MultiScaleCrop', input_size=224,
         scales=(1, 0.8), random_crop=False, max_wh_scale_gap=0),
    dict(type='Resize', scale=(224, 224), keep_ratio=False),
    dict(type='Flip', flip_ratio=0.5),
    dict(type='Normalize', **img_norm_cfg),
    dict(type='FormatShape', input_format='NCTHW'),
    dict(type='Collect', keys=['imgs', 'label'], meta_keys=[]),
    dict(type='ToTensor', keys=['imgs', 'label']),
]
data = dict(train=dict(_delete_=True, type=dataset_type,
                       ann_file=ann_file_train, data_prefix=data_root,
                       pipeline=train_pipeline))
work_dir = './work_dirs/i3d_r50_video_32x2x1_100e_kinetics400_rgb'
