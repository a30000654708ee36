# SSv2 fine-tune from MSCL SSL pretrain.
# Parity: reference configs/recognition/ssl_test/test_ssv2_r18.py with the
# redis data plane replaced by the local-file dataset.
_base_ = [
    '../../_base_/default_runtime.py'
]

work_dir = './work_dirs/ssl_test/sthv2/mscl_r18_ssv2'
default_dir = None

model = dict(
    type='Recognizer3D',
    backbone=dict(type='torchvision.r3d_18'),
    cls_head=dict(
        type='I3DHead',
        num_classes=174,
        in_channels=512,
        spatial_type='none',    # torchvision r3d_18 pools internally
        dropout_ratio=0.5),
    # ssl_pretrain drives the checkpoint surgery: load
    # recognizer.encoder_q.* into backbone (reference base.py:129-203)
    train_cfg=dict(ssl_pretrain=dict(
        pretrained=dict(
            filename='./work_dirs/ssl_train/mscl_r18_cosm_lr2e-2/'
                     'epoch_400.ckpt'),
        backbone=dict(prefix='recognizer.encoder_q'),
    )),
    test_cfg=dict(average_clips='prob'))

image_shape = (112, 112)
crop_shape = 128
image_short = 128
dataset_type = 'FileRawframeDataset'
data_root = 'data/sthv2'
pkl_path = f'{data_root}/annotations/somethingv2_train.pkl'
pkl_path_val = f'{data_root}/annotations/somethingv2_val.pkl'
visual_cfg = dict(cur_path=work_dir, default_path=default_dir,
                  dataset_name='sthv2', vis_acc=True, vis_cf=False, k=20)
img_norm_cfg = dict(
    mean=[123.675, 116.28, 103.53], std=[58.395, 57.12, 57.375],
    to_bgr=False)
train_pipeline = [
    dict(type='SampleFrames', clip_len=1, frame_interval=1, num_clips=16),
    dict(type='LocalDecode'),
    dict(type='Resize', scale=(-1, 256)),
    dict(type='RandomResizedCrop'),
    dict(type='Resize', scale=image_shape, keep_ratio=False),
    dict(type='Normalize', **img_norm_cfg),
    dict(type='Seg2T'),
    dict(type='Collect', keys=['imgs', 'label'], meta_keys=[]),
    dict(type='ToTensor', keys=['imgs', 'label'])
]
val_pipeline = [
    dict(type='SampleFrames', clip_len=1, frame_interval=1, num_clips=16,
         test_mode=True),
    dict(type='LocalDecode'),
    dict(type='Resize', scale=(-1, image_short)),
    dict(type='CenterCrop', crop_size=crop_shape),
    dict(type='Normalize', **img_norm_cfg),
    dict(type='Seg2T'),
    dict(type='Collect', keys=['imgs', 'label'], meta_keys=[]),
    dict(type='ToTensor', keys=['imgs', 'label'])
]
test_pipeline = [
    dict(type='SampleFrames', clip_len=1, frame_interval=1, num_clips=8,
         test_mode=True),
    dict(type='LocalDecode'),
    dict(type='Resize', scale=(-1, image_short)),
    dict(type='CenterCrop', crop_size=crop_shape),
    dict(type='Normalize', **img_norm_cfg),
    dict(type='Seg2T'),
    dict(type='Collect', keys=['imgs', 'label'], meta_keys=[]),
    dict(type='ToTensor', keys=['imgs', 'label'])
]
data = dict(
    videos_per_gpu=32,
    workers_per_gpu=4,
    train=dict(type=dataset_type, pkl_path=pkl_path,
               pipeline=train_pipeline),
    val=dict(type=dataset_type, pkl_path=pkl_path_val,
             pipeline=val_pipeline, visual_cfg=visual_cfg),
    test=dict(type=dataset_type, pkl_path=pkl_path_val,
              pipeline=test_pipeline, visual_cfg=visual_cfg))
evaluation = dict(interval=2,
                  metrics=['top_k_accuracy', 'vis_mean_class_accuracy'])

optimizer = dict(type='SGD', lr=0.12, momentum=0.9, weight_decay=1e-6)
optimizer_config = dict(grad_clip=dict(max_norm=40, norm_type=2))
lr_config = dict(policy='step', step=[14, 18])
total_epochs = 22
checkpoint_config = dict(interval=5)
log_config = dict(interval=20, hooks=[dict(type='TextLoggerHook')])
