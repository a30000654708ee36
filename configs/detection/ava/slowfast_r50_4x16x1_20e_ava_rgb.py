# SlowFast FastRCNN AVA detector (parity: reference configs/detection/
# ava/slowfast_kinetics_pretrained_r50_4x16x1_20e_ava_rgb.py).
_base_ = ['../../_base_/default_runtime.py',
          '../_base_/models/fastrcnn_slowonly_r50.py']

model = dict(
    backbone=dict(
        _delete_=True,
        type='ResNet3dSlowFast', pretrained=None, resample_rate=8,
        speed_ratio=8, channel_ratio=8,
        slow_pathway=dict(type='resnet3d', depth=50, pretrained=None,
                          lateral=True, conv1_kernel=(1, 7, 7),
                          conv1_stride_t=1, pool1_stride_t=1,
                          spatial_strides=(1, 2, 2, 1)),
        fast_pathway=dict(type='resnet3d', depth=50, pretrained=None,
                          lateral=False, base_channels=8,
                          conv1_kernel=(5, 7, 7), conv1_stride_t=1,
                          pool1_stride_t=1,
                          spatial_strides=(1, 2, 2, 1))),
    roi_head=dict(bbox_head=dict(in_channels=2304)))

dataset_type = 'AVADataset'
data_root = 'data/ava/rawframes'
anno_root = 'data/ava/annotations'
ann_file_train = f'{anno_root}/ava_train_v2.1.csv'
ann_file_val = f'{anno_root}/ava_val_v2.1.csv'
exclude_file_train = f'{anno_root}/ava_train_excluded_timestamps_v2.1.csv'
exclude_file_val = f'{anno_root}/ava_val_excluded_timestamps_v2.1.csv'
proposal_file_train = (f'{anno_root}/ava_dense_proposals_train.'
                       f'FAIR.recall_93.9.pkl')
proposal_file_val = (f'{anno_root}/ava_dense_proposals_val.'
                     f'FAIR.recall_93.9.pkl')
img_norm_cfg = dict(mean=[123.675, 116.28, 103.53],
                    std=[58.395, 57.12, 57.375], to_bgr=False)
train_pipeline = [
    dict(type='SampleAVAFrames', clip_len=32, frame_interval=2),
    dict(type='RawFrameDecode'),
    dict(type='RandomRescale', scale_range=(256, 320)),
    dict(type='RandomCrop', size=256),
    dict(type='Flip', flip_ratio=0.5),
    dict(type='Normalize', **img_norm_cfg),
    dict(type='AVAAssignSample',
         rcnn=dict(assigner=dict(type='MaxIoUAssignerAVA',
                                 pos_iou_thr=0.9, neg_iou_thr=0.9,
                                 min_pos_iou=0.9),
                   sampler=dict(type='RandomSampler', num=32,
                                pos_fraction=1, neg_pos_ub=-1,
                                add_gt_as_proposals=True),
                   pos_weight=1.0)),
    dict(type='FormatShape', input_format='NCTHW', collapse=True),
    dict(type='Collect',
         keys=['imgs', 'rois', 'roi_labels', 'roi_weights'],
         meta_keys=[]),
    dict(type='ToTensor',
         keys=['imgs', 'rois', 'roi_labels', 'roi_weights']),
]
data = dict(
    videos_per_gpu=6, workers_per_gpu=2,
    train=dict(type=dataset_type, ann_file=ann_file_train,
               exclude_file=exclude_file_train,
               proposal_file=proposal_file_train,
               data_prefix=data_root, pipeline=train_pipeline))
optimizer = dict(type='SGD', lr=0.1125, momentum=0.9,
                 weight_decay=1e-5)
optimizer_config = dict(grad_clip=dict(max_norm=40, norm_type=2))
lr_config = dict(policy='step', step=[10, 15],
                 warmup='linear', warmup_ratio=0.1, warmup_iters=5,
                 warmup_by_epoch=True)
total_epochs = 20
checkpoint_config = dict(interval=1)
log_config = dict(interval=20, hooks=[dict(type='TextLoggerHook')])
work_dir = './work_dirs/ava/slowfast_r50_4x16x1_20e_ava_rgb'
