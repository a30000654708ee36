# LFB (non-local feature-bank operator) AVA detector (parity: reference
# configs/detection/lfb/lfb_nl_kinetics_pretrained_slowonly_r50_4x16x1_
# 20e_ava_rgb.py). The bank itself is host-side (models/heads/lfb.py::
# LFB + LFBInferHead, built by a prior infer pass).
_base_ = ['../ava/slowonly_r50_4x16x1_20e_ava_rgb.py']

lfb_prefix_path = 'data/ava/lfb_half'
model = dict(
    roi_head=dict(
        shared_head=dict(
            type='FBOHead',
            lfb_cfg=dict(lfb_prefix_path=lfb_prefix_path,
                         max_num_sampled_feat=5, window_size=60,
                         lfb_channels=2048,
                         dataset_modes=('train', 'val')),
            fbo_cfg=dict(type='non_local', st_feat_channels=2048,
                         lt_feat_channels=2048,
                         latent_channels=512, num_st_feat=1,
                         num_lt_feat=5 * 60)),
        bbox_head=dict(in_channels=4096)))
work_dir = './work_dirs/lfb_nl_r50_4x16x1_20e_ava_rgb'
