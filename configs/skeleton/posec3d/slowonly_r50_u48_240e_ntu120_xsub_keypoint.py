# parity: reference configs/skeleton/posec3d/
# slowonly_r50_u48_240e_ntu120_xsub_keypoint.py.
_base_ = ['slowonly_r50_u48_240e_ntu60_xsub_keypoint.py']
model = dict(cls_head=dict(num_classes=120))
ann_file_train = 'data/posec3d/ntu120_xsub_train.pkl'
ann_file_val = 'data/posec3d/ntu120_xsub_val.pkl'
data = dict(train=dict(ann_file=ann_file_train))
work_dir = './work_dirs/slowonly_r50_u48_240e_ntu120_xsub_keypoint'
