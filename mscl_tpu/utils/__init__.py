from .flow_viz import flow_to_image, flow_uv_to_colors, make_colorwheel
from .np4 import np4_decode, np4_encode

__all__ = ['flow_to_image', 'flow_uv_to_colors', 'make_colorwheel',
           'np4_decode', 'np4_encode']
