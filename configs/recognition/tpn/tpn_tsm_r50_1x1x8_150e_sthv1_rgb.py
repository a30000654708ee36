# parity: reference configs/recognition/tpn/
# tpn_tsm_r50_1x1x8_150e_sthv1_rgb.py (TPN over a TSM 2D backbone).
_base_ = ['tpn_slowonly_r50_8x8x1_150e_kinetics400_rgb.py']
model = dict(
    type='Recognizer2D',
    backbone=dict(_delete_=True, type='ResNetTSM', depth=50,
                  num_segments=8, shift_div=8, out_indices=(2, 3)),
    neck=dict(in_channels=[1024, 2048], out_channels=1024,
              spatial_modulation_cfg=dict(in_channels=[1024, 2048],
                                          out_channels=2048),
              temporal_modulation_cfg=dict(downsample_scales=(8, 8)),
              upsample_cfg=dict(scale_factor=(1, 1, 1)),
              downsample_cfg=dict(downsample_scale=(1, 1, 1)),
              level_fusion_cfg=dict(
                  in_channels=[1024, 1024], mid_channels=[1024, 1024],
                  out_channels=2048, downsample_scales=[(1, 1, 1),
                                                        (1, 1, 1)]),
              aux_head_cfg=dict(out_channels=174, loss_weight=0.5)),
    cls_head=dict(num_classes=174))
data_root = 'data/sthv1/rawframes'
ann_file_train = 'data/sthv1/sthv1_train_list_rawframes.txt'
img_norm_cfg = dict(mean=[123.675, 116.28, 103.53],
                    std=[58.395, 57.12, 57.375], to_bgr=False)
train_pipeline = [
    dict(type='SampleFrames', clip_len=1, frame_interval=1, num_clips=8),
    dict(type='RawFrameDecode'),
    dict(type='Resize', scale=(-1, 256)),
    dict(type='MultiScaleCrop', input_size=224,
         scales=(1, 0.875, 0.75, 0.66), random_crop=False,
         max_wh_scale_gap=1, num_fixed_crops=13),
    dict(type='Resize', scale=(224, 224), keep_ratio=False),
    dict(type='Flip', flip_ratio=0.5),
    dict(type='Normalize', **img_norm_cfg),
    dict(type='FormatShape', input_format='NCHW'),
    dict(type='Collect', keys=['imgs', 'label'], meta_keys=[]),
    dict(type='ToTensor', keys=['imgs', 'label']),
]
data = dict(train=dict(ann_file=ann_file_train, data_prefix=data_root,
                       filename_tmpl='{:05}.jpg',
                       pipeline=train_pipeline))
work_dir = './work_dirs/tpn_tsm_r50_1x1x8_150e_sthv1_rgb'
