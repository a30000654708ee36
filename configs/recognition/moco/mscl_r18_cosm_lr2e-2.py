# MSCL r18 pretrain — the paper's headline recipe.
# Parity: reference configs/recognition/moco/mscl_r18_cosm_lr2e-2.py with
# the Megvii redis/nori data plane replaced by the local-file dataset
# (the reference README's own TODO, README.md:38-41). All model
# hyperparameters are identical.
_base_ = [
    '../../_base_/default_runtime.py'
]

# model settings
ft_dim = 128
image_shape = (112, 112)
num_frames = 8
stride = 8
crop_shape = 128
total_epochs = 400
dataset_size = 219136

rgb_recognizer = dict(
    type='MoCoV2',
    backbone=dict(type='torchvision.r3d_18'),
    neck=dict(
        type='TPNMoCo', in_channels=[128, 256, 512], out_channels=128,
        sepc_cfg=dict(in_channels=[128, 128, 128], out_channels=128,
                      stride=(2, 2, 2), iBN=False, Pconv_num=2),
    ),
    moco_head=dict(type='MoCoHead', basename='',
                   loss_cls=dict(type='CrossEntropyLoss_torch',
                                 ignore_index=-1)),
    im_key='imgs', dim_in=512, dim=ft_dim,
    K=65536, m_base=0.994, max_iters=dataset_size * total_epochs, T=0.07,
    mlp=True, aux_info=[], aug=dict(type='IdentityAug'))
flow_recognizer = dict(
    type='MoCoV2',
    backbone=dict(type='resnet_flow.r2d_18'),
    neck=dict(type='BaseMoCo'),
    moco_head=dict(type='MoCoHead', basename='flow',
                   loss_cls=dict(type='CrossEntropyLoss_torch',
                                 ignore_index=-1)),
    im_key='imgs', dim_in=128, dim=ft_dim,
    K=65536, m_base=0.994, max_iters=dataset_size * total_epochs, T=0.07,
    mlp=True, aux_info=[], aug=dict(type='IdentityAug'))
model = dict(
    type='MSCLWithAug',
    recognizer=rgb_recognizer, recognizer_flow=flow_recognizer,
    moco_mx_head=dict(type='MSCLWithAugMxHead', basename='mx',
                      loss_cls=dict(type='CrossEntropyLoss_torch',
                                    ignore_index=-1),
                      same_kn=True, T=0.07),
    sup_head=dict(type='MSCLWithAugPosHeadV2', basename='',
                  loss_pos=dict(type='CrossEntropyLoss_torch',
                                ignore_index=-1),
                  bkb_channels=(None, None), t=num_frames // 2, T=0.07,
                  aux_keys=dict(
                      im_features=dict(q_mlvl='q_mlvl'),
                      base_flow_features=dict(q_mlvl='q_flow_mlvl'),
                      aug_flow_features=dict(q_mlvl='q_aug_flow_mlvl'))),
    im_key='imgs', flow_key='flow_imgs', aux_info=[],
    update_aug_flow=False, weight_aug_flow=(1.0, 1.0),
    aug=dict(type='SyncMoCoAugmentV5', crop_size=image_shape[0],
             sync_level=('batch', 'batch'), t=(num_frames, num_frames),
             flow_suffix='flow_imgs', weak_aug=(False, False),
             visualize=True),
    same_kn=True,
)

# dataset settings — local filesystem (FileRawframeDataset also answers to
# the reference name RedisRawframeDataset)
dataset_type = 'FileRawframeDataset'
data_root = 'data/kinetics400'
pkl_path = f'{data_root}/annotations/kinetics400_train_mds.pkl'
pkl_path_val = f'{data_root}/annotations/kinetics400_val_mds.pkl'
extra_keys = ['nids_flow', 'chosen_idx']
img_norm_cfg = dict(
    mean=[123.675, 116.28, 103.53], std=[58.395, 57.12, 57.375],
    to_bgr=False)
train_pipeline = [
    dict(type='MatchFlow', gap=2, adjacent=8, flow_key='nids_flow'),
    dict(type='TemporalShiftChosenSampleFrames', clip_len=num_frames,
         frame_interval=stride, num_clips=1, shift_range=1),
    # host-decode optimization: pre-sample the crop boxes so LocalDecode
    # can half-scale-decode the halves whose crop allows it (same crop
    # distribution; MoCoRandomResizedCrop consumes the pre-sampled boxes)
    dict(type='MoCoDecodePlan', target=image_shape, area_range=(0.2, 1.0)),
    dict(type='LocalDecode'),
    dict(type='NormFlowWithStidedAug', ratios=(0.2, 1.8), num_chunks=8,
         merge_aug=True),
    dict(type='MoCoRandomResizedCrop', area_range=(0.2, 1.0),
         flow_key='flow_imgs'),
    dict(type='MoCoResize', scale=image_shape, keep_ratio=False,
         flow_key='flow_imgs', suffix='_q'),
    dict(type='MoCoResize', scale=image_shape, keep_ratio=False,
         flow_key='flow_imgs', suffix='_k'),
    dict(type='MoCoNormalize', ori_flow=True),
    dict(type='Collect', keys=['imgs', 'flow_imgs'], meta_keys=[]),
    dict(type='ToTensor', keys=['imgs', 'flow_imgs'], batched=True),
]
val_pipeline = [
    dict(type='MatchFlow', gap=2, adjacent=8, flow_key='nids_flow'),
    dict(type='ChosenSampleFrames', clip_len=num_frames,
         frame_interval=stride, num_clips=1),
    dict(type='LocalDecode'),
    dict(type='NormFlowWithStidedAug', ratios=(0.2, 1.8), num_chunks=8,
         merge_aug=True),
    dict(type='MoCoRandomResizedCrop', area_range=(0.2, 1.0),
         flow_key='flow_imgs'),
    dict(type='MoCoResize', scale=image_shape, keep_ratio=False,
         flow_key='flow_imgs', suffix='_q'),
    dict(type='MoCoResize', scale=image_shape, keep_ratio=False,
         flow_key='flow_imgs', suffix='_k'),
    dict(type='MoCoNormalize', ori_flow=True),
    dict(type='Collect', keys=['imgs', 'flow_imgs'], meta_keys=[]),
    dict(type='ToTensor', keys=['imgs', 'flow_imgs'], batched=True),
]
data = dict(
    videos_per_gpu=32,    # per-device; global batch = 32 * num_devices
    workers_per_gpu=4,
    train=dict(
        type=dataset_type,
        pkl_path=pkl_path,
        pipeline=train_pipeline,
        extra_keys=extra_keys),
    val=dict(
        type=dataset_type,
        pkl_path=pkl_path_val,
        pipeline=val_pipeline,
        extra_keys=extra_keys),
    train_dataloader=dict(drop_last=True),
    val_dataloader=dict(drop_last=True))

evaluation = dict(interval=5, simple=True)
# optimizer: lr 0.02 @ global batch 128
optimizer = dict(type='SGD', lr=0.02, momentum=0.9, weight_decay=1e-4)
optimizer_config = dict(grad_clip=dict(max_norm=40, norm_type=2))
lr_config = dict(policy='CosineAnnealing', min_lr=0, warmup_iters=5,
                 warmup_by_epoch=True)
checkpoint_config = dict(interval=10)
log_config = dict(interval=20, hooks=[dict(type='TextLoggerHook')])
work_dir = './work_dirs/ssl_train/mscl_r18_cosm_lr2e-2'
