# parity: reference configs/_base_/models/slowfast_r50.py
model = dict(
    type='Recognizer3D',
    backbone=dict(
        type='ResNet3dSlowFast', pretrained=None, resample_rate=8,
        speed_ratio=8, channel_ratio=8,
        slow_pathway=dict(type='resnet3d', depth=50, lateral=True,
                          conv1_kernel=(1, 7, 7), conv1_stride_t=1,
                          pool1_stride_t=1, inflate=(0, 0, 1, 1),
                          norm_eval=False),
        fast_pathway=dict(type='resnet3d', depth=50, lateral=False,
                          base_channels=8, conv1_kernel=(5, 7, 7),
                          conv1_stride_t=1, pool1_stride_t=1,
                          norm_eval=False)),
    cls_head=dict(type='SlowFastHead', num_classes=400,
                  in_channels=2304, spatial_type='avg',
                  dropout_ratio=0.5),
    train_cfg=None,
    test_cfg=dict(average_clips='prob'))
