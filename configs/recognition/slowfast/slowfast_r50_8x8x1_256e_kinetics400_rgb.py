# parity: reference configs/recognition/slowfast/
# slowfast_r50_8x8x1_256e_kinetics400_rgb.py (8x8 pathway geometry).
_base_ = ['slowfast_r50_4x16x1_256e_kinetics400_rgb.py']
model = dict(backbone=dict(resample_rate=4, speed_ratio=4))
work_dir = './work_dirs/slowfast_r50_8x8x1_256e_kinetics400_rgb'
