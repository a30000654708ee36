from .flow_viz import flow_to_image, flow_uv_to_colors, make_colorwheel
from .np4 import np4_decode, np4_encode
from .torch_weights import (convert_videoresnet_state_dict,
                            graft_backbone_weights,
                            load_torchvision_video_resnet)

__all__ = ['flow_to_image', 'flow_uv_to_colors', 'make_colorwheel',
           'np4_decode', 'np4_encode', 'convert_videoresnet_state_dict',
           'load_torchvision_video_resnet', 'graft_backbone_weights']
