# parity: reference configs/detection/lfb/lfb_max_kinetics_pretrained_
# slowonly_r50_4x16x1_20e_ava_rgb.py (max feature-bank operator).
_base_ = ['lfb_nl_r50_4x16x1_20e_ava_rgb.py']
model = dict(roi_head=dict(shared_head=dict(
    fbo_cfg=dict(_delete_=True, type='max'))))
work_dir = './work_dirs/lfb_max_r50_4x16x1_20e_ava_rgb'
