from .bbox import (MaxIoUAssignerAVA, RandomSampler, assign_and_sample,
                   bbox_overlaps, bbox_target)
from .checkpoint import (latest_checkpoint, load_checkpoint, publish_model,
                         restore_model_state, save_checkpoint)
from .evaluation.accuracy import (confusion_matrix, mean_average_precision,
                                  mean_class_accuracy,
                                  mmit_mean_average_precision,
                                  top_k_accuracy)
from .lr_schedule import build_lr_schedule
from .precise_bn import precise_bn_update
from .optimizer import (build_optimizer, build_tsm_optimizer,
                        make_freeze_mask)
from .train_loop import (OmniSourceRunner, Runner, TrainState, init_state,
                         make_train_step)

__all__ = ['confusion_matrix', 'mean_average_precision',
           'mean_class_accuracy', 'mmit_mean_average_precision',
           'top_k_accuracy', 'build_lr_schedule', 'build_optimizer',
           'make_freeze_mask', 'build_tsm_optimizer', 'Runner',
           'OmniSourceRunner', 'TrainState', 'init_state',
           'make_train_step', 'save_checkpoint', 'load_checkpoint',
           'latest_checkpoint', 'publish_model', 'precise_bn_update',
           'restore_model_state',
           'MaxIoUAssignerAVA', 'RandomSampler', 'assign_and_sample',
           'bbox_overlaps', 'bbox_target']
