from .ssl_aug import (FlowVisualizer, IdentityAug, MoCoAugment,
                      MoCoAugmentV2, SyncMoCoAugmentV2, SyncMoCoAugmentV3,
                      SyncMoCoAugmentV5, color_jitter_video,
                      flow_uv_to_colors, gaussian_blur_video, hflip_video,
                      normalize_video, random_grayscale_video, strong_aug)
from .motion_map import MotionMapCalculator

__all__ = ['FlowVisualizer', 'IdentityAug', 'MoCoAugment', 'MoCoAugmentV2',
           'SyncMoCoAugmentV2', 'SyncMoCoAugmentV3', 'SyncMoCoAugmentV5',
           'color_jitter_video', 'flow_uv_to_colors', 'gaussian_blur_video',
           'hflip_video', 'normalize_video', 'random_grayscale_video',
           'strong_aug', 'MotionMapCalculator']
