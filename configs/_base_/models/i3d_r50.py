# parity: reference configs/_base_/models/i3d_r50.py
model = dict(
    type='Recognizer3D',
    backbone=dict(type='ResNet3d', depth=50, pretrained=None,
                  pretrained2d=True, inflate=((1, 1, 1), (1, 0, 1, 0),
                                              (1, 0, 1, 0, 1, 0),
                                              (0, 1, 0)),
                  zero_init_residual=False),
    cls_head=dict(type='I3DHead', num_classes=400, in_channels=2048,
                  spatial_type='avg', dropout_ratio=0.5,
                  init_std=0.01),
    train_cfg=None,
    test_cfg=dict(average_clips='prob'))
