# TSN over native Swin-B (parity: reference configs/recognition/tsn/
# custom_backbones/tsn_swin_transformer_video_320p_*.py, which
# dispatches to timm; here backbones/extern_2d.py::SwinTransformer).
_base_ = ['../tsn_r50_1x1x3_100e_kinetics400_rgb.py']
model = dict(
    backbone=dict(type='timm.swin_base_patch4_window7_224',
                  _delete_=True),
    cls_head=dict(in_channels=1024))
work_dir = './work_dirs/tsn_swin_base_1x1x3_100e_kinetics400_rgb'
