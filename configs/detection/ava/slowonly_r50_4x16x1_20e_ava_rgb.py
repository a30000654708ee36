# AVA SlowOnly FastRCNN (parity: reference configs/detection/ava/
# slowonly_kinetics_pretrained_r50_4x16x1_20e_ava_rgb.py; proposals are
# assigned/sampled host-side by AVAAssignSample).
_base_ = ['../../_base_/default_runtime.py']

rcnn_train_cfg = dict(
    assigner=dict(type='MaxIoUAssignerAVA', pos_iou_thr=0.9,
                  neg_iou_thr=0.9, min_pos_iou=0.9),
    sampler=dict(type='RandomSampler', num=32, pos_fraction=1,
                 neg_pos_ub=-1, add_gt_as_proposals=True),
    pos_weight=1.0)
model = dict(
    type='AVAFastRCNN',
    backbone=dict(type='ResNet3dSlowOnly', depth=50, pretrained=None,
                  lateral=False, conv1_kernel=(1, 7, 7),
                  conv1_stride_t=1, pool1_stride_t=1,
                  spatial_strides=(1, 2, 2, 1)),
    roi_head=dict(
        bbox_roi_extractor=dict(type='SingleRoIExtractor3D',
                                roi_layer_type='RoIAlign',
                                featmap_stride=16, output_size=8,
                                with_temporal_pool=True),
        bbox_head=dict(type='BBoxHeadAVA', in_channels=2048,
                       num_classes=81, multilabel=True,
                       dropout_ratio=0.5)),
    train_cfg=dict(rcnn=rcnn_train_cfg),
    test_cfg=dict(rcnn=dict(action_thr=0.002)))
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
    dict(type='SampleAVAFrames', clip_len=4, frame_interval=16),
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
data = dict(
    videos_per_gpu=8, workers_per_gpu=4,
    train=dict(type=dataset_type, ann_file=ann_file_train,
               exclude_file=exclude_file_train,
               proposal_file=proposal_file_train,
               data_prefix=data_root, pipeline=train_pipeline))
optimizer = dict(type='SGD', lr=0.2, momentum=0.9, weight_decay=1e-5)
optimizer_config = dict(grad_clip=dict(max_norm=40, norm_type=2))
lr_config = dict(policy='step', step=[10, 15])
total_epochs = 20
checkpoint_config = dict(interval=1)
log_config = dict(interval=20, hooks=[dict(type='TextLoggerHook')])
work_dir = './work_dirs/ava/slowonly_r50_4x16x1_20e_ava_rgb'
