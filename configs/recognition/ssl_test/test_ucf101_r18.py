# UCF101 fine-tune from MSCL SSL pretrain — the headline 91.5% top-1
# recipe (BASELINE.md). Structure mirrors test_ssv2_r18.py with UCF101
# classes/paths (the reference releases only the ssv2 config; this is the
# same protocol pointed at UCF101).
_base_ = ['./test_ssv2_r18.py']

work_dir = './work_dirs/ssl_test/ucf101/mscl_r18_ucf101'

model = dict(cls_head=dict(num_classes=101))

data_root = 'data/ucf101'
data = dict(
    train=dict(pkl_path=f'{data_root}/annotations/ucf101_train.pkl'),
    val=dict(pkl_path=f'{data_root}/annotations/ucf101_val.pkl'),
    test=dict(pkl_path=f'{data_root}/annotations/ucf101_val.pkl'))
