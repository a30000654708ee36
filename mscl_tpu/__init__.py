"""mscl_tpu — TPU-native video self-supervised learning framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
megvii-research/MSCL (MMAction2-based MoCo/MSCL video SSL): config/registry
system, clip data pipelines (MDS, FRA, MoCo paired crops), 3D ResNet video
encoders, MoCo v2 momentum towers with negative queues, the MSCL composite
objective (global InfoNCE + cross-modal RGB<->flow + frame-level LMCL),
downstream fine-tuning, retrieval, and flow-extraction tooling — designed
for SPMD execution over TPU device meshes via jit/pjit/shard_map.
"""

__version__ = '0.1.0'

from .config import Config, ConfigDict, DictAction
from .registry import Registry, build_from_cfg

__all__ = ['Config', 'ConfigDict', 'DictAction', 'Registry', 'build_from_cfg',
           '__version__']
