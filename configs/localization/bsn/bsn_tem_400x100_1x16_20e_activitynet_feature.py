# BSN TEM stage (parity: reference configs/localization/bsn/
# bsn_tem_400x100_1x16_20e_activitynet_feature.py + _base_/models/bsn_tem.py).
_base_ = ['../../_base_/default_runtime.py']

model = dict(type='TEM', temporal_dim=100, boundary_ratio=0.1,
             tem_feat_dim=400, tem_hidden_dim=512,
             tem_match_threshold=0.5)
dataset_type = 'ActivityNetDataset'
data_root = 'data/ActivityNet/activitynet_feature_cuhk/csv_mean_100/'
ann_file_train = 'data/ActivityNet/anet_anno_train.json'
ann_file_val = 'data/ActivityNet/anet_anno_val.json'
ann_file_test = 'data/ActivityNet/anet_anno_full.json'
train_pipeline = [
    dict(type='LoadLocalizationFeature'),
    dict(type='GenerateLocalizationLabels'),
    dict(type='Collect', keys=['raw_feature', 'gt_bbox'],
         meta_name='video_meta', meta_keys=['video_name']),
    dict(type='ToTensor', keys=['raw_feature', 'gt_bbox']),
    dict(type='ToDataContainer',
         fields=[dict(key='gt_bbox', stack=False)]),
]
test_pipeline = [
    dict(type='LoadLocalizationFeature'),
    dict(type='Collect', keys=['raw_feature'], meta_name='video_meta',
         meta_keys=['video_name']),
    dict(type='ToTensor', keys=['raw_feature']),
]
data = dict(
    videos_per_gpu=16, workers_per_gpu=8,
    train=dict(type=dataset_type, ann_file=ann_file_train,
               data_prefix=data_root, pipeline=train_pipeline),
    val=dict(type=dataset_type, ann_file=ann_file_val,
             data_prefix=data_root, pipeline=train_pipeline),
    test=dict(type=dataset_type, ann_file=ann_file_test,
              data_prefix=data_root, pipeline=test_pipeline))
optimizer = dict(type='SGD', lr=0.001, momentum=0.9, weight_decay=1e-4)
optimizer_config = dict(grad_clip=None)
lr_config = dict(policy='step', step=[7])
total_epochs = 20
checkpoint_config = dict(interval=1, filename_tmpl='tem_epoch_{}.pth')
log_config = dict(interval=50, hooks=[dict(type='TextLoggerHook')])
work_dir = './work_dirs/bsn_400x100_1x16_20e_activitynet_feature'
