# parity: reference configs/recognition/r2plus1d/
# r2plus1d_r34_8x8x1_180e_kinetics400_rgb.py.
_base_ = ['r2plus1d_r18_8x8x1_180e_kinetics400_rgb.py']
model = dict(backbone=dict(depth=34))
work_dir = './work_dirs/r2plus1d_r34_8x8x1_180e_kinetics400_rgb'
