from .inference import extract_features, run_test
from .train import build_model_from_cfg, train_model

__all__ = ['train_model', 'build_model_from_cfg', 'run_test',
           'extract_features']
