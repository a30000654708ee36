# parity: reference configs/recognition/slowonly/
# slowonly_r50_4x16x1_256e_kinetics400_flow.py (2-channel flow input).
_base_ = ['slowonly_r50_4x16x1_256e_kinetics400_rgb.py']
model = dict(backbone=dict(in_channels=2, with_pool2=False),
             cls_head=dict(num_classes=400))
data_root = 'data/kinetics400/rawframes_train'
ann_file_train = ('data/kinetics400/'
                  'kinetics400_flow_train_list_rawframes.txt')
img_norm_cfg = dict(mean=[128, 128], std=[128, 128], to_bgr=False)
train_pipeline = [
    dict(type='SampleFrames', clip_len=4, frame_interval=16,
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
data = dict(train=dict(ann_file=ann_file_train, modality='Flow',
                       filename_tmpl='{}_{:05d}.jpg',
                       pipeline=train_pipeline))
work_dir = './work_dirs/slowonly_r50_4x16x1_256e_kinetics400_flow'
