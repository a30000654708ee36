# parity: reference configs/detection/ava/slowonly_kinetics_pretrained_
# r50_4x16x1_20e_ava_rgb_custom_classes.py.
_base_ = ['slowonly_r50_4x16x1_20e_ava_rgb.py']
custom_classes = [11, 12, 14, 15, 17, 59, 74, 79, 80]
num_classes = 10          # len(custom_classes) + 1
model = dict(roi_head=dict(bbox_head=dict(num_classes=10)))
data = dict(train=dict(num_classes=10, custom_classes=custom_classes))
work_dir = './work_dirs/ava/slowonly_r50_4x16x1_20e_ava_rgb_custom_classes'
