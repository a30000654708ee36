# TSN over native ResNeXt-101 32x4d (parity: reference configs/
# recognition/tsn/custom_backbones/tsn_rn101_32x4d_320p_*.py, which
# dispatches to mmcls; here backbones/extern_2d.py::ResNeXt).
_base_ = ['../tsn_r50_1x1x3_100e_kinetics400_rgb.py']
model = dict(
    backbone=dict(type='mmcls.ResNeXt', depth=101, num_stages=4,
                  out_indices=(3,), groups=32, width_per_group=4,
                  style='pytorch', _delete_=True),
    cls_head=dict(in_channels=2048))
work_dir = './work_dirs/tsn_rn101_32x4d_1x1x3_100e_kinetics400_rgb'
