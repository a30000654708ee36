from .base import BaseHead, topk_accuracy
from .i3d_head import I3DHead
from .local_align_heads import (FGMoDistPredHead, MAMSCLWithAugPosHead,
                                MlvlMSCLWithAugPosHead, MoDistMSEPredHead,
                                MoDistPredDTHead, MoDistPredHead,
                                MoDistv2PosHead, MSCLWithAugAPPosHead,
                                MSCLWithAugPosHead, MSCLWithAugSimpleHead,
                                MTMoDistPredHead)
from .lfb import (ACRNHead, FBOHead, FBONonLocal, LFB, LFBInferHead,
                  NonLocalLayer, sample_lfb)
from .local_cl_head import MSCLWithAugPosHeadV2
from .moco_head import MoCoHead
from .recognition_heads import (AudioTSNHead, SlowFastHead, TRNHead,
                                TimeSformerHead, TPNHead, TSMHead,
                                TSNHead, X3DHead)
from .moco_head_v2 import MSCLWithAugMxHead
from .reid_distill_heads import (FGTSMReidSimpleHead, RcMoDistHead,
                                 TSMHead3D, TSMReidSimpleHead)
from .moco_head_v3 import (MoCoHeadV2, MSCLWithAugDistillMxHead,
                           MSCLWithAugMSFMxHead, MSFHead, NMSFHead)

__all__ = ['BaseHead', 'topk_accuracy', 'I3DHead', 'MoCoHead',
           'MSCLWithAugMxHead', 'MSCLWithAugPosHeadV2', 'MoDistPredHead',
           'MoDistMSEPredHead', 'FGMoDistPredHead', 'MoDistPredDTHead',
           'MTMoDistPredHead', 'MoDistv2PosHead', 'MSCLWithAugPosHead',
           'MSCLWithAugAPPosHead', 'MSCLWithAugSimpleHead',
           'MlvlMSCLWithAugPosHead', 'MAMSCLWithAugPosHead', 'MoCoHeadV2',
           'MSFHead', 'NMSFHead', 'MSCLWithAugMSFMxHead',
           'MSCLWithAugDistillMxHead', 'TSNHead', 'TSMHead', 'TPNHead',
           'TSMHead3D', 'TSMReidSimpleHead', 'FGTSMReidSimpleHead',
           'RcMoDistHead',
           'TimeSformerHead', 'AudioTSNHead', 'TRNHead',
           'LFB', 'FBOHead', 'FBONonLocal', 'NonLocalLayer',
           'LFBInferHead', 'ACRNHead', 'sample_lfb',
           'X3DHead', 'SlowFastHead']
