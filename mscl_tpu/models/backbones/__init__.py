from .video_resnet import (BasicBlock3D, Bottleneck3D, ConvBN, VideoResNet)

__all__ = ['VideoResNet', 'BasicBlock3D', 'Bottleneck3D', 'ConvBN']
from .resnet3d import (BasicBlock3d, Bottleneck3d, ResNet3d,
                       ResNet3dSlowFast, ResNet3dSlowOnly)

__all__ += ['ResNet3d', 'ResNet3dSlowOnly', 'ResNet3dSlowFast',
            'BasicBlock3d', 'Bottleneck3d']
