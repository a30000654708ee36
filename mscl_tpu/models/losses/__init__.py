from .cross_entropy_loss import (BCELossWithLogits, CrossEntropyLoss,
                                 CrossEntropyLossTorch, NLLLoss, TripletLoss,
                                 WeightedCrossEntropyLoss_torch,
                                 cross_entropy, soft_cross_entropy)
from .bmn_loss import (BinaryLogisticRegressionLoss, BMNLoss,
                       binary_logistic_regression_loss)
from .hvu_loss import HVULoss, OHEMHingeLoss, ohem_hinge_loss
from .circle_loss import (MultiPositiveCircleLoss, MultiPositiveSumLoss,
                          MultiPositiveUniLoss)

__all__ = ['CrossEntropyLoss', 'CrossEntropyLossTorch', 'BCELossWithLogits',
           'NLLLoss', 'cross_entropy', 'soft_cross_entropy',
           'MultiPositiveSumLoss', 'MultiPositiveUniLoss',
           'MultiPositiveCircleLoss', 'BMNLoss', 'BinaryLogisticRegressionLoss',
           'binary_logistic_regression_loss', 'HVULoss', 'OHEMHingeLoss',
           'ohem_hinge_loss', 'TripletLoss', 'WeightedCrossEntropyLoss_torch']
