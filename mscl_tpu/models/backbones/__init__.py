from .video_resnet import (BasicBlock3D, Bottleneck3D, ConvBN,
                           ResNet2Plus1d, VideoResNet)

__all__ = ['VideoResNet', 'BasicBlock3D', 'Bottleneck3D', 'ConvBN']
from .resnet3d import (BasicBlock3d, Bottleneck3d, ResNet3d,
                       ResNet3dCSN, ResNet3dSlowFast, ResNet3dSlowOnly)

__all__ += ['ResNet3d', 'ResNet3dSlowOnly', 'ResNet3dSlowFast',
            'ResNet3dCSN', 'ResNet2Plus1d',
            'BasicBlock3d', 'Bottleneck3d']
from .resnet2d import C3D, ResNet, ResNetTSM, temporal_shift
from .x3d import X3D

__all__ += ['ResNet', 'ResNetTSM', 'C3D', 'X3D', 'temporal_shift']
from .mobilenet_v2 import MobileNetV2, MobileNetV2TSM
from .timesformer import TimeSformer

__all__ += ['MobileNetV2', 'MobileNetV2TSM', 'TimeSformer']
from .s3d import S3D, SepConv3d

__all__ += ['S3D', 'SepConv3d']
from .tanet import TAM, TANet

__all__ += ['TANet', 'TAM']
from .resnet_audio import ConvAudio, ResNetAudio
from .resnet_tin import ResNetTIN, TemporalInterlace, linear_sampler, \
    tin_shift

__all__ += ['ResNetAudio', 'ConvAudio', 'ResNetTIN', 'TemporalInterlace',
            'linear_sampler', 'tin_shift']
from .extern_2d import DenseNet, ResNeXt, SwinTransformer

__all__ += ['ResNeXt', 'DenseNet', 'SwinTransformer']
