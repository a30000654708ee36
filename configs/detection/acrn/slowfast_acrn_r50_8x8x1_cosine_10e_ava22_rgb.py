# ACRN actor-context relation AVA detector (parity: reference
# configs/detection/acrn/slowfast_acrn_kinetics_pretrained_r50_8x8x1_
# cosine_10e_ava22_rgb.py).
_base_ = ['../ava/slowonly_r50_4x16x1_20e_ava_rgb.py']

model = dict(
    roi_head=dict(
        shared_head=dict(type='ACRNHead', in_channels=4096,
                         out_channels=2048),
        bbox_head=dict(in_channels=2048)))
optimizer = dict(type='SGD', lr=0.075, momentum=0.9, weight_decay=1e-5)
lr_config = dict(policy='CosineAnnealing', min_lr=0, warmup='linear',
                 warmup_by_epoch=True, warmup_iters=2,
                 warmup_ratio=0.1)
total_epochs = 10
work_dir = './work_dirs/slowfast_acrn_r50_8x8x1_cosine_10e_ava22_rgb'
