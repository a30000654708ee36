from .augmentations import (CenterCrop, ColorJitter, Flip, MultiScaleCrop,
                            Normalize, RandomCrop, RandomRescale,
                            RandomResizedCrop, Resize, TenCrop, ThreeCrop)
from .compose import Compose
from .formatting import (Collect, FormatShape, Rename, ToTensor, Transpose,
                         to_tensor)
from .loading import (ArrayDecode, DenseSampleFrames, LocalDecode,
                      OpenCVDecode, OpenCVInit, RawFrameDecode, SampleFrames)
from .loading_mscl import (AlignIndex, ChosenSampleFrames, MatchFlow, Seg2T,
                           TemporalShiftChosenSampleFrames,
                           TemporalShiftSampleFrames)
from .combined_augmentations import MoCoTransform
from .mcl_augmentations import MCLRandomResizedCrop, motion_map_from_flow
from .pose_loading import (GeneratePoseTarget, LoadKineticsPose,
                           PoseDecode, UniformSampleFrames)
from .moco_augmentations import (MoCoDecodePlan, MoCoNormalize,
                                 MoCoNormalizeV2, MoCoRandomResizedCrop,
                                 MoCoResize)
from .transforms_motion import (Flow2ImgWithAug, NormFlowV2, NormFlowWithAug,
                                NormFlowWithAugV2, NormFlowWithStidedAug,
                                NormFlowWithStidedAugV2, norm_flow)

__all__ = [
    'Compose', 'Collect', 'FormatShape', 'Rename', 'ToTensor', 'Transpose',
    'to_tensor', 'SampleFrames', 'DenseSampleFrames', 'RawFrameDecode',
    'LocalDecode', 'OpenCVInit', 'OpenCVDecode', 'ArrayDecode', 'MatchFlow',
    'AlignIndex', 'Seg2T', 'ChosenSampleFrames',
    'TemporalShiftChosenSampleFrames', 'TemporalShiftSampleFrames',
    'MoCoDecodePlan', 'MoCoRandomResizedCrop', 'MoCoResize',
    'MoCoNormalize', 'MoCoNormalizeV2',
    'NormFlowWithStidedAug', 'NormFlowWithStidedAugV2', 'NormFlowWithAug',
    'NormFlowWithAugV2', 'NormFlowV2', 'Flow2ImgWithAug', 'norm_flow',
    'RandomCrop', 'RandomResizedCrop', 'MultiScaleCrop', 'Resize',
    'RandomRescale', 'Flip', 'Normalize', 'CenterCrop', 'ThreeCrop',
    'TenCrop', 'ColorJitter', 'MoCoTransform', 'MCLRandomResizedCrop',
    'motion_map_from_flow',
]
