from .activitynet_dataset import ActivityNetDataset
from .audio_dataset import (AudioDataset, AudioFeatureDataset)
from .ava_dataset import AVAAssignSample, AVADataset, SampleAVAFrames
from .base import BaseDataset
from .blending import CutmixBlending, MixupBlending
from .builder import (BLENDINGS, DATASETS, PIPELINES, build_dataloader,
                      build_dataset)
from .dataset_wrappers import ConcatDataset, RepeatDataset
from .file_dataset import FileRawframe2BranchDataset, FileRawframeDataset
from .loader import NumpyLoader, default_collate
from .misc_datasets import HVUDataset, PoseDataset, RawVideoDataset
from .rawframe_dataset import RawframeDataset, VideoDataset
from .ssn_dataset import SampleProposalFrames, SSNDataset, SSNInstance
from . import pipelines  # noqa: F401  (registers all transforms)

__all__ = [
    'BaseDataset', 'DATASETS', 'PIPELINES', 'BLENDINGS', 'build_dataset',
    'build_dataloader', 'RawframeDataset', 'VideoDataset',
    'FileRawframeDataset', 'FileRawframe2BranchDataset', 'NumpyLoader',
    'default_collate', 'RepeatDataset', 'ConcatDataset',
    'MixupBlending', 'CutmixBlending', 'ActivityNetDataset',
    'AVADataset', 'SampleAVAFrames', 'AVAAssignSample',
    'SSNDataset', 'SSNInstance', 'SampleProposalFrames',
    'AudioDataset', 'AudioFeatureDataset',
    'PoseDataset', 'HVUDataset', 'RawVideoDataset',
]
