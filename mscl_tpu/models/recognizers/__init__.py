from .base import (get_ssl_state_dict, graft_subtree, init_from_ssl_pretrain,
                   parse_losses)
from .moco import (MoCo, MoCoV2, build_ema_fn, sync_key_variables,
                   tree_ema_pairs)
from .mscl import MSCL, MSCLWithAug, MoDist
from .audio_recognizer import AudioRecognizer
from .recognizer2d import Recognizer2D
from .recognizer3d import Recognizer3D, to_nthwc

__all__ = ['AudioRecognizer', 'Recognizer3D', 'to_nthwc', 'parse_losses', 'get_ssl_state_dict',
           'graft_subtree', 'init_from_ssl_pretrain', 'MoCo', 'MoCoV2',
           'MSCL', 'MSCLWithAug', 'MoDist', 'build_ema_fn',
           'sync_key_variables', 'tree_ema_pairs', 'Recognizer2D']
