# parity: reference configs/detection/ava/
# slowfast_context_kinetics_pretrained_r50_4x16x1_20e_ava_rgb.py
# (RoI features concatenated with the resized global feature map).
_base_ = ['slowfast_r50_4x16x1_20e_ava_rgb.py']
model = dict(roi_head=dict(
    bbox_roi_extractor=dict(type='SingleRoIExtractor3D',
                            roi_layer_type='RoIAlign', output_size=8,
                            with_temporal_pool=True, with_global=True),
    bbox_head=dict(in_channels=4608)))
work_dir = './work_dirs/ava/slowfast_context_r50_4x16x1_20e_ava_rgb'
