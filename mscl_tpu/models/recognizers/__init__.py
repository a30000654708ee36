from .base import (get_ssl_state_dict, graft_subtree, init_from_ssl_pretrain,
                   parse_losses)
from .recognizer3d import Recognizer3D, to_nthwc

__all__ = ['Recognizer3D', 'to_nthwc', 'parse_losses', 'get_ssl_state_dict',
           'graft_subtree', 'init_from_ssl_pretrain']
