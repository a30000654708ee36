from .decayed_infonce import decayed_infonce_neg, decayed_infonce_neg_xla

__all__ = ['decayed_infonce_neg', 'decayed_infonce_neg_xla']
