from .decayed_infonce import decayed_infonce_neg, decayed_infonce_neg_xla
from .roi_align import roi_align

__all__ = ['decayed_infonce_neg', 'decayed_infonce_neg_xla', 'roi_align']
