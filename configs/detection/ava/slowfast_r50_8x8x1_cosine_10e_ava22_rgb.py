# parity: reference configs/detection/ava/
# slowfast_kinetics_pretrained_r50_8x8x1_cosine_10e_ava22_rgb.py
# (AVA v2.2 annotations, cosine schedule).
_base_ = ['slowfast_r50_8x8x1_20e_ava_rgb.py']
anno_root = 'data/ava/annotations'
ann_file_train = f'{anno_root}/ava_train_v2.2.csv'
ann_file_val = f'{anno_root}/ava_val_v2.2.csv'
exclude_file_train = f'{anno_root}/ava_train_excluded_timestamps_v2.2.csv'
exclude_file_val = f'{anno_root}/ava_val_excluded_timestamps_v2.2.csv'
data = dict(train=dict(ann_file=ann_file_train,
                       exclude_file=exclude_file_train))
lr_config = dict(_delete_=True, policy='CosineAnnealing', min_lr=0,
                 warmup='linear', warmup_ratio=0.1, warmup_iters=2,
                 warmup_by_epoch=True)
total_epochs = 10
work_dir = './work_dirs/ava/slowfast_r50_8x8x1_cosine_10e_ava22_rgb'
