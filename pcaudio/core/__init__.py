from pcaudio.core.types import PointCloud
from pcaudio.core.config import (
    ExperimentConfig,
    ARCH_FST,
    ARCH_FB,
    ARCH_3ST,
    ARCH_CNN,
)

__all__ = ["PointCloud", "ExperimentConfig", "ARCH_FST", "ARCH_FB",
           "ARCH_3ST", "ARCH_CNN"]
