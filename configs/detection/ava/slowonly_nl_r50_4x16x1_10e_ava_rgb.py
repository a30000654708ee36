# parity: reference configs/detection/ava/
# slowonly_nl_kinetics_pretrained_r50_4x16x1_10e_ava_rgb.py
# (embedded-gaussian non-local blocks in stages 2-3).
_base_ = ['slowonly_r50_4x16x1_20e_ava_rgb.py']
model = dict(backbone=dict(
    non_local=((0, 0, 0), (1, 0, 1, 0), (1, 0, 1, 0, 1, 0), (0, 0, 0)),
    non_local_cfg=dict(sub_sample=True, use_scale=True,
                       norm_cfg=dict(type='BN3d', requires_grad=True),
                       mode='embedded_gaussian')))
optimizer = dict(lr=0.3, nesterov=True, weight_decay=1e-6)
lr_config = dict(_delete_=True, policy='step', step=[8, 9],
                 warmup='linear', warmup_ratio=0.1, warmup_iters=2,
                 warmup_by_epoch=True)
total_epochs = 10
work_dir = './work_dirs/ava/slowonly_nl_r50_4x16x1_10e_ava_rgb'
