# parity: reference configs/skeleton/posec3d/
# slowonly_r50_u48_240e_ntu60_xsub_limb.py (limb heatmaps instead of
# keypoint heatmaps).
_base_ = ['slowonly_r50_u48_240e_ntu60_xsub_keypoint.py']
left_kp = [1, 3, 5, 7, 9, 11, 13, 15]
right_kp = [2, 4, 6, 8, 10, 12, 14, 16]
skeletons = [(0, 1), (0, 2), (1, 3), (2, 4), (0, 5), (5, 7), (7, 9),
             (0, 6), (6, 8), (8, 10), (5, 11), (11, 13), (13, 15),
             (6, 12), (12, 14), (14, 16), (11, 12)]
model = dict(backbone=dict(in_channels=17))
train_pipeline = [
    dict(type='UniformSampleFrames', clip_len=48),
    dict(type='PoseDecode'),
    dict(type='PoseCompact', hw_ratio=1., allow_imgpad=True),
    dict(type='Resize', scale=(-1, 64)),
    dict(type='RandomResizedCrop', area_range=(0.56, 1.0)),
    dict(type='Resize', scale=(56, 56), keep_ratio=False),
    dict(type='Flip', flip_ratio=0.5, left_kp=left_kp,
         right_kp=right_kp),
    dict(type='GeneratePoseTarget', sigma=0.6, use_score=True,
         with_kp=False, with_limb=True, skeletons=skeletons),
    dict(type='FormatShape', input_format='NCTHW_Heatmap'),
    dict(type='Collect', keys=['imgs', 'label'], meta_keys=[]),
    dict(type='ToTensor', keys=['imgs', 'label']),
]
data = dict(train=dict(pipeline=train_pipeline))
work_dir = './work_dirs/slowonly_r50_u48_240e_ntu60_xsub_limb'
