# parity: reference configs/detection/ava/
# slowfast_kinetics_pretrained_r50_8x8x1_20e_ava_rgb.py (8x8 pathway
# geometry: resample_rate/speed_ratio 4).
_base_ = ['slowfast_r50_4x16x1_20e_ava_rgb.py']
model = dict(backbone=dict(resample_rate=4, speed_ratio=4))
optimizer = dict(lr=0.075)
work_dir = './work_dirs/ava/slowfast_r50_8x8x1_20e_ava_rgb'
