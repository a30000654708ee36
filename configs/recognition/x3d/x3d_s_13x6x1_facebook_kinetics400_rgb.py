# X3D-S (parity: reference configs/recognition/x3d/
# x3d_s_13x6x1_facebook_kinetics400_rgb.py).
_base_ = ['../../_base_/default_runtime.py']

model = dict(
    type='Recognizer3D',
    backbone=dict(type='X3D', gamma_w=1, gamma_b=2.25, gamma_d=2.2),
    cls_head=dict(type='X3DHead', in_channels=432, num_classes=400,
                  spatial_type='avg', dropout_ratio=0.5,
                  fc1_bias=False),
    test_cfg=dict(average_clips='prob'))
dataset_type = 'VideoDataset'
data_root_val = 'data/kinetics400/videos_val'
ann_file_test = 'data/kinetics400/kinetics400_val_list_videos.txt'
img_norm_cfg = dict(mean=[114.75, 114.75, 114.75],
                    std=[57.375, 57.375, 57.375], to_bgr=False)
test_pipeline = [
    dict(type='OpenCVInit'),
    dict(type='SampleFrames', clip_len=13, frame_interval=6,
         num_clips=10, test_mode=True),
    dict(type='OpenCVDecode'),
    dict(type='Resize', scale=(-1, 182)),
    dict(type='ThreeCrop', crop_size=182),
    dict(type='Normalize', **img_norm_cfg),
    dict(type='FormatShape', input_format='NCTHW'),
    dict(type='Collect', keys=['imgs', 'label'], meta_keys=[]),
    dict(type='ToTensor', keys=['imgs']),
]
data = dict(
    videos_per_gpu=1, workers_per_gpu=2,
    test=dict(type=dataset_type, ann_file=ann_file_test,
              data_prefix=data_root_val, pipeline=test_pipeline))
work_dir = './work_dirs/x3d_s_13x6x1_facebook_kinetics400_rgb'
