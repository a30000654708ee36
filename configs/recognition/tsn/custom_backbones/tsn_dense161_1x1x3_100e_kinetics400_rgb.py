# TSN over native DenseNet-161 (parity: reference configs/recognition/
# tsn/custom_backbones/tsn_dense161_320p_*.py, which dispatches to
# torchvision; here backbones/extern_2d.py::DenseNet).
_base_ = ['../tsn_r50_1x1x3_100e_kinetics400_rgb.py']
model = dict(
    backbone=dict(type='torchvision.densenet161', _delete_=True),
    cls_head=dict(in_channels=2208))
work_dir = './work_dirs/tsn_dense161_1x1x3_100e_kinetics400_rgb'
