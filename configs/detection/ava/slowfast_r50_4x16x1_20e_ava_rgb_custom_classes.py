# parity: reference configs/detection/ava/slowfast_kinetics_pretrained_
# r50_4x16x1_20e_ava_rgb_custom_classes.py (train on a class subset;
# background class prepended).
_base_ = ['slowfast_r50_4x16x1_20e_ava_rgb.py']
custom_classes = [3, 6, 10, 27, 29, 38, 41, 48, 51, 53, 54, 59, 61, 64,
                  70, 72]
num_classes = 17          # len(custom_classes) + 1
model = dict(roi_head=dict(bbox_head=dict(num_classes=17)))
data = dict(train=dict(num_classes=17, custom_classes=custom_classes))
work_dir = './work_dirs/ava/slowfast_r50_4x16x1_20e_ava_rgb_custom_classes'
