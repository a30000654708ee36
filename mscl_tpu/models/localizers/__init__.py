from .base import parse_losses_localizer
from .bmn import BMN, build_interp1d_mask, build_match_map

__all__ = ['BMN', 'build_interp1d_mask', 'build_match_map',
           'parse_losses_localizer']
