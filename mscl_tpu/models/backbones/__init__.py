from .video_resnet import (BasicBlock3D, Bottleneck3D, ConvBN, VideoResNet)

__all__ = ['VideoResNet', 'BasicBlock3D', 'Bottleneck3D', 'ConvBN']
