# parity: reference configs/recognition/tsn/hvu/
# tsn_r18_1x1x8_100e_hvu_action_rgb.py (multi-task HVU tags, HVULoss).
_base_ = ['tsn_r50_1x1x8_100e_kinetics400_rgb.py']
category_nums = dict(action=739)
model = dict(
    backbone=dict(depth=18),
    cls_head=dict(
        _delete_=True, type='TSNHead', num_classes=739, in_channels=512,
        spatial_type='avg', consensus=dict(type='AvgConsensus', dim=1),
        dropout_ratio=0.4, init_std=0.01, multi_class=True,
        loss_cls=dict(type='HVULoss', categories=('action',),
                      category_nums=(739,), category_loss_weights=(1,),
                      loss_type='individual', with_mask=False)))
dataset_type = 'HVUDataset'
data_root = 'data/hvu/rawframes_train'
ann_file_train = 'data/hvu/hvu_train.json'
img_norm_cfg = dict(mean=[123.675, 116.28, 103.53],
                    std=[58.395, 57.12, 57.375], to_bgr=False)
train_pipeline = [
    dict(type='SampleFrames', clip_len=1, frame_interval=1, num_clips=8),
    dict(type='RawFrameDecode'),
    dict(type='LoadHVULabel', categories=('action',),
         category_nums=(739,)),
    dict(type='Resize', scale=(-1, 256)),
    dict(type='MultiScaleCrop', input_size=224,
         scales=(1, 0.875, 0.75, 0.66), random_crop=False,
         max_wh_scale_gap=1),
    dict(type='Resize', scale=(224, 224), keep_ratio=False),
    dict(type='Flip', flip_ratio=0.5),
    dict(type='Normalize', **img_norm_cfg),
    dict(type='FormatShape', input_format='NCHW'),
    dict(type='Collect', keys=['imgs', 'label', 'mask', 'category_mask'],
         meta_keys=[]),
    dict(type='ToTensor', keys=['imgs', 'label', 'mask',
                                'category_mask']),
]
data = dict(train=dict(_delete_=True, type=dataset_type,
                       ann_file=ann_file_train, data_prefix=data_root,
                       tag_categories=['action'], tag_category_nums=[739],
                       pipeline=train_pipeline))
work_dir = './work_dirs/tsn_r18_1x1x8_100e_hvu_action_rgb'
