from .base import BaseHead, topk_accuracy
from .i3d_head import I3DHead

__all__ = ['BaseHead', 'topk_accuracy', 'I3DHead']
