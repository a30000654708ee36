# MoCo r18 with batch-synchronized clip-consistent augmentation.
# Parity: reference configs/recognition/moco/
# moco_r18_cosistent_video_lr3e-2.py (sync_level='batch',
# eval interval 10; reference filename typo kept for config parity).
_base_ = ['../../_base_/default_runtime.py']

ft_dim = 128
image_shape = (112, 112)
num_frames = 8
stride = 8
dataset_type = 'FileRawframeDataset'
data_root = 'data/kinetics400'
pkl_path = f'{data_root}/annotations/kinetics400_train.pkl'
pkl_path_val = f'{data_root}/annotations/kinetics400_val.pkl'
train_pipeline = [
    dict(type='SampleFrames', clip_len=num_frames, frame_interval=stride,
         num_clips=1),
    dict(type='LocalDecode'),
    dict(type='MoCoTransform',
         crop_transform=dict(size=image_shape, scale=(0.2, 1))),
    dict(type='Collect', keys=['imgs'], meta_keys=[]),
    dict(type='ToTensor', keys=['imgs'], batched=True),
]
val_pipeline = train_pipeline
data = dict(
    videos_per_gpu=16,
    workers_per_gpu=4,
    train=dict(type=dataset_type, pkl_path=pkl_path,
               pipeline=train_pipeline),
    val=dict(type=dataset_type, pkl_path=pkl_path_val,
             pipeline=val_pipeline),
    train_dataloader=dict(drop_last=True),
    val_dataloader=dict(drop_last=True))
optimizer = dict(type='SGD', lr=0.015, momentum=0.9, weight_decay=1e-4)
optimizer_config = dict(grad_clip=dict(max_norm=40, norm_type=2))
lr_config = dict(policy='CosineAnnealing', min_lr=0)
total_epochs = 200
checkpoint_config = dict(interval=10)
log_config = dict(interval=20, hooks=[dict(type='TextLoggerHook')])

model = dict(
    type='MoCo',
    backbone=dict(type='torchvision.r3d_18'),
    neck=dict(type='BaseMoCo'),
    moco_head=dict(type='MoCoHead',
                   loss_cls=dict(type='CrossEntropyLoss_torch',
                                 ignore_index=-1)),
    im_key='imgs', dim_in=512, dim=ft_dim,
    K=65536, m=0.999, T=0.07, mlp=True, aux_info=[],
    aug=dict(type='SyncMoCoAugmentV2', crop_size=image_shape[0],
             sync_level='batch', t=num_frames, flow_suffix=None))
evaluation = dict(interval=10, simple=True)
work_dir = './work_dirs/ssl_train/moco_consistent_vid_k400_lr3e-2'
