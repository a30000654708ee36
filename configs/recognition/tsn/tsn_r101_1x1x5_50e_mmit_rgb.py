# parity: reference configs/recognition/tsn/
# tsn_r101_1x1x5_50e_mmit_rgb.py (multi-label Moments-in-Time, BCE).
_base_ = ['tsn_r50_1x1x3_100e_kinetics400_rgb.py']
model = dict(
    backbone=dict(depth=101),
    cls_head=dict(_delete_=True, type='TSNHead', num_classes=313,
                  in_channels=2048, spatial_type='avg',
                  consensus=dict(type='AvgConsensus', dim=1),
                  dropout_ratio=0.5, init_std=0.01, multi_class=True,
                  label_smooth_eps=0.0,
                  loss_cls=dict(type='BCELossWithLogits')))
data_root = 'data/mmit/rawframes_train'
ann_file_train = 'data/mmit/mmit_train_list_rawframes.txt'
data = dict(train=dict(ann_file=ann_file_train, data_prefix=data_root,
                       multi_class=True, num_classes=313))
optimizer = dict(lr=0.01)
lr_config = dict(_delete_=True, policy='step', step=[20, 40])
total_epochs = 50
work_dir = './work_dirs/tsn_r101_1x1x5_50e_mmit_rgb'
