# parity: reference configs/detection/ava/
# slowonly_nl_kinetics_pretrained_r50_8x8x1_10e_ava_rgb.py.
_base_ = ['slowonly_nl_r50_4x16x1_10e_ava_rgb.py']
img_norm_cfg = dict(mean=[123.675, 116.28, 103.53],
                    std=[58.395, 57.12, 57.375], to_bgr=False)
rcnn_train_cfg = dict(
    assigner=dict(type='MaxIoUAssignerAVA', pos_iou_thr=0.9,
                  neg_iou_thr=0.9, min_pos_iou=0.9),
    sampler=dict(type='RandomSampler', num=32, pos_fraction=1,
                 neg_pos_ub=-1, add_gt_as_proposals=True),
    pos_weight=1.0)
train_pipeline = [
    dict(type='SampleAVAFrames', clip_len=8, frame_interval=8),
    dict(type='RawFrameDecode'),
    dict(type='RandomRescale', scale_range=(256, 320)),
    dict(type='RandomCrop', size=256),
    dict(type='Flip', flip_ratio=0.5),
    dict(type='Normalize', **img_norm_cfg),
    dict(type='AVAAssignSample', rcnn=rcnn_train_cfg),
    dict(type='FormatShape', input_format='NCTHW', collapse=True),
    dict(type='Collect',
         keys=['imgs', 'rois', 'roi_labels', 'roi_weights'],
         meta_keys=[]),
    dict(type='ToTensor',
         keys=['imgs', 'rois', 'roi_labels', 'roi_weights']),
]
data = dict(train=dict(pipeline=train_pipeline))
optimizer = dict(lr=0.15)
work_dir = './work_dirs/ava/slowonly_nl_r50_8x8x1_10e_ava_rgb'
